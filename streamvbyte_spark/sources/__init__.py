from .tokens import (documents_scan, posting_lists, synthetic_tokens, tokens_from_documents,  # noqa: F401
                     tokens_from_jsonl, write_tokens_jsonl)
