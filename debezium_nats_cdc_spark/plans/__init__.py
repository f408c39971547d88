from .explain import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    formatted_plan,
)
