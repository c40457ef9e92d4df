from isosurfacesuperresolution_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, make_sharded_train_step,
    render_cameras_sharded)
