"""Parallelism: device meshes, batch sharding, multi-host process utilities."""

from svt_speechbrain_tpu.parallel.distributed import (  # noqa: F401
    run_on_main, if_main_process, main_process_only, ddp_barrier, ddp_init_group,
)
from svt_speechbrain_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, data_parallel_sharding,
)
from svt_speechbrain_tpu.parallel.fsdp import (  # noqa: F401
    apply_fsdp, fsdp_shardings,
)
