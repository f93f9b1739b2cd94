from megapath_tpu.amplicon.debruijn import DeBruijnGraph, candidate_haplotypes  # noqa: F401
from megapath_tpu.amplicon.realign import realign_window, WindowRealignment  # noqa: F401
