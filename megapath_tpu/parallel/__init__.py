from megapath_tpu.parallel.dist import (  # noqa: F401
    make_mesh,
    build_dist_align_step,
    shard_arrays,
    DistAlignOut,
)
