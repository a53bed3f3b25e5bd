"""Mesh / sharding / multi-host Monte-Carlo sweep machinery."""

from ofdm_tpu.parallel import halo
from ofdm_tpu.parallel.mesh import distributed_init, make_mesh
from ofdm_tpu.parallel.sweep import ShardedLinkRunner, run_sweep

__all__ = ["ShardedLinkRunner", "distributed_init", "halo", "make_mesh", "run_sweep"]
