"""Declared query inventory (SURVEY.md §2), one module per part.

Importing this package populates the registry. ``ALL_MODULES`` is the
import side-effect hook used by ``registry.load_all()``.
"""

from . import part_a_migration  # noqa: F401
from . import part_b_relational  # noqa: F401
from . import part_c_windows  # noqa: F401
from . import part_d_scalars  # noqa: F401
from . import part_e_events  # noqa: F401
from . import part_f_llm  # noqa: F401
from . import part_g_udf  # noqa: F401

ALL_MODULES = [
    part_a_migration,
    part_b_relational,
    part_c_windows,
    part_d_scalars,
    part_e_events,
    part_f_llm,
    part_g_udf,
]
