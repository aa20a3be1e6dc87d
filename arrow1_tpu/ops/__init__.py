"""Kernel modules. Importing this package registers all compute functions
(the analogue of RegisterScalarArithmetic etc. in
reference cpp/src/arrow/compute/registry.cc:115-140)."""

from . import aggregate  # noqa: F401
from . import arithmetic  # noqa: F401
from . import bitwise  # noqa: F401
from . import boolean  # noqa: F401
from . import cast  # noqa: F401
from . import compare  # noqa: F401
from . import conditional  # noqa: F401
from . import cumulative  # noqa: F401
from . import dictionary  # noqa: F401
from . import groupby  # noqa: F401
from . import hash  # noqa: F401
from . import join  # noqa: F401
from . import math  # noqa: F401
from . import nested  # noqa: F401
from . import ree  # noqa: F401
from . import strings  # noqa: F401
from . import temporal  # noqa: F401
from . import selection  # noqa: F401
from . import set_lookup  # noqa: F401
from . import sort  # noqa: F401
from . import validity  # noqa: F401
