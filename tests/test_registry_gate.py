"""The driver's correctness gate samples the FIRST 50 registry entries in
dict order.  These tests pin the rotation contract (queries.GATE_ROTATE_OUT):
the heavyweight dataloader-facing operators must sit inside the gate window,
every query keeps an oracle, and the rotation list never silently names a
query that no longer exists (build_queries raises on that, but the window
membership itself is only visible here)."""

from __future__ import annotations

import __spark_entry__ as entry
from streamvbyte_spark import queries as q

# the r5-verdict list: never driver-gated before round 6
MUST_GATE = {
    "pack_sequences", "pack_sequences_encoded", "curation_pipeline",
    "sequence_pack", "decontaminate", "dedup_components",
    "curate_neardup_metrics", "event_sessions", "nation_revenue",
    "ann_recall_ivf",
}


def test_rotation_targets_inside_gate_window():
    names = list(entry.queries())
    first = set(names[:q.GATE_WINDOW])
    missing = MUST_GATE - first
    assert not missing, f"not in the driver's first-{q.GATE_WINDOW}: {missing}"


def test_every_query_has_an_oracle():
    queries = entry.queries()
    oracles = entry.oracle_sql()
    assert set(queries) == set(oracles)


def test_rotated_out_queries_exist_and_fit():
    names = list(entry.queries())
    assert set(q.GATE_ROTATE_OUT) <= set(names)
    # rotation invariant: nothing outside the window except rotated entries
    in_window = [n for n in names if n not in q.GATE_ROTATE_OUT]
    assert len(in_window) <= q.GATE_WINDOW
    # rotated entries are contiguous at the END (insertion-order contract)
    assert names[-len(q.GATE_ROTATE_OUT):] == list(q.GATE_ROTATE_OUT)
