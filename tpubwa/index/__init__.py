from tpubwa.index.fmindex import FMIndex, CP_BLOCK  # noqa: F401
from tpubwa.index.sais import suffix_array  # noqa: F401
