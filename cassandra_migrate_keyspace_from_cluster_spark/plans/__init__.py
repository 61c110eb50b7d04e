from .explain import physical_plan, assert_pushed_filter, assert_broadcast  # noqa: F401
