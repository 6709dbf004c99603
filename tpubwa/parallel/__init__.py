from tpubwa.parallel.mesh import (  # noqa: F401
    make_mesh, device_align_step, sharded_align_step)
