from .asof import asof_join_last_earlier  # noqa: F401
