"""Specification core: DVB-S2/S2X constants, tables, and reference algorithms.

Everything in this subpackage is pure numpy/Python (no JAX) and serves as both
the single source of truth for standard-defined constants and the golden
reference the TPU ops in ``dvbs2rx_tpu.ops`` are tested against.
"""

from . import pl_defs  # noqa: F401
from .pls import PLSInfo, parse_pls, make_pls, pls_filter  # noqa: F401
from .fec_params import FECInfo, get_fec_info, DVBS2_MODCODS, MODCOD_NUMBERS  # noqa: F401
from .ldpc_tables import get_code, available_tables  # noqa: F401
