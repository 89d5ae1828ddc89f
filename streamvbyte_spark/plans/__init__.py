from .explain import assert_broadcast_join, count_exchanges, plan_string  # noqa: F401
