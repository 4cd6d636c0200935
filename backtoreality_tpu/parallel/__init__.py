"""Device mesh / data-parallel training utilities."""

from backtoreality_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    local_rows,
    local_rows_tree,
    process_shard_info,
)
