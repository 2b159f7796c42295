"""Multi-host (multi-process) execution support.

The TPU-native replacement for the reference's multi-machine launcher
(detectron2/engine/launch.py:27-125: `num_machines`, `machine_rank`,
`dist_url`, per-process `init_process_group`) and the rank/world helpers of
utils/comm.py (get_rank:60, get_world_size:53, is_main_process:67,
synchronize:75, all_gather:120, reduce_dict:237).

Design (one process per HOST, not per chip — the JAX model):
  * `initialize(num_machines, machine_rank, dist_url)` wires
    `jax.distributed.initialize`; afterwards `jax.devices()` spans every
    host's chips and a single global-view jit program drives them all. On
    TPU pods the three args can all be left at their defaults and the pod
    metadata supplies coordinator/rank automatically.
  * Data: every process keeps the SAME global sampler/bucket stream (so all
    hosts agree on each step's pad bucket — the global SPMD program needs
    ONE static shape per step) but maps/collates only its own contiguous
    row-block of each global batch (`local_rows`). `shard_batch`
    (parallel/mesh.py) then assembles the global array from the per-process
    blocks with `jax.make_array_from_process_local_data`, which makes the
    multi-host global batch bit-identical to the single-host one.
  * Outputs: loss/metric scalars are replicated by the train step, so
    `jax.device_get` works on every host unchanged. Detection outputs are
    fetched with `fetch` (process_allgather when not fully addressable).

CPU emulation: gloo is jaxlib's default cross-process CPU collectives
backend, so the 2-process integration test (tests/test_multihost.py) runs
the REAL multi-process path — two `jax.distributed` processes over local
TCP, 4 virtual devices each — and pins it bit-equal to single-process DP(8).
"""

import logging
from typing import Any, List, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize(
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    local_device_ids: Optional[List[int]] = None,
) -> None:
    """`jax.distributed.initialize` from the reference launch() surface
    (launch.py:27). No-op for the single-machine default. `dist_url` accepts
    the reference's "tcp://host:port" form (or bare "host:port"); "auto" or
    None defers to JAX's TPU-pod auto-detection."""
    if num_machines <= 1:
        return
    # NOTE: must not touch the XLA backend (jax.process_count(), jax.devices()
    # etc.) before jax.distributed.initialize; probe the distributed client
    # state directly to detect an already-initialized harness.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized (e.g. by the test harness)
    coordinator = None
    if dist_url and dist_url != "auto":
        coordinator = dist_url
        for prefix in ("tcp://", "grpc://"):
            if coordinator.startswith(prefix):
                coordinator = coordinator[len(prefix):]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_machines,
        process_id=machine_rank,
        local_device_ids=local_device_ids,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


# ---- rank/world helpers (reference utils/comm.py:53-79) ----
def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


_BARRIER_SEQ = [0]


def synchronize(timeout_ms: int = 1_200_000) -> None:
    """Barrier across processes (reference comm.synchronize:75).

    Uses the coordination-service HOST barrier (pure gRPC), NOT a device
    collective: on the CPU-emulation backend a device collective's gloo
    context init has a hardcoded 30 s window for all participants to
    arrive, so a barrier meant to absorb large skews (e.g. one host still
    compiling) must not itself ride the device path."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is not None:
        _BARRIER_SEQ[0] += 1
        client.wait_at_barrier(f"cddmsl_sync_{_BARRIER_SEQ[0]}", timeout_ms)
    else:  # pragma: no cover - initialize() always sets the client
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("cddmsl_sync")


def warm_and_align(jitted_fn, *args) -> None:
    """Compile-then-barrier-then-dispatch discipline for the CPU-emulation
    multi-process backend: AOT-compile the program for these args WITHOUT
    dispatching (jit .lower().compile()), then host-barrier. Gloo creates
    collective cliques lazily at a program's FIRST execution and gives late
    arrivals only a hardcoded 30 s window — per-process compile times on a
    shared core routinely skew beyond that, so the first dispatch must
    happen after every process has finished compiling. No-op single-process
    and on real TPU (whose collectives have no such window)."""
    if jax.process_count() <= 1 or jax.default_backend() != "cpu":
        return
    try:
        jitted_fn.lower(*args).compile()
    except Exception:  # non-jit wrappers: barrier alone still helps
        logger.warning("warm_and_align: could not pre-compile %r", jitted_fn)
    synchronize()


def local_rows(n: int, rank: Optional[int] = None, world: Optional[int] = None) -> Tuple[int, int]:
    """This process's contiguous row-block [lo, hi) of an n-row global batch.

    Contiguous (not strided) so that concatenating blocks in process order
    reproduces the single-host batch exactly: the mesh's 'data' axis is laid
    out over `jax.devices()`, which orders devices process-major, so process
    p's local devices hold global rows [p*n/world, (p+1)*n/world)."""
    world = world if world is not None else jax.process_count()
    rank = rank if rank is not None else jax.process_index()
    assert n % world == 0, (
        f"global batch {n} must divide evenly over {world} processes"
    )
    per = n // world
    return rank * per, (rank + 1) * per


def fetch(x: Any) -> Optional[np.ndarray]:
    """Device array -> full host numpy on EVERY process, regardless of
    addressability (reference comm.all_gather:120 analogue for jit outputs).
    Fully-addressable (or replicated) arrays take the plain device_get path;
    cross-process-sharded arrays are replicated via process_allgather."""
    if x is None:
        return None
    if isinstance(x, jax.Array) and not x.is_fully_addressable and not x.is_fully_replicated:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))
