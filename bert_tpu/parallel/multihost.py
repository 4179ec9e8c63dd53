"""Multi-host (DCN) scaffolding: process-group init, global meshes, and
host-local ↔ global array plumbing.

The reference is strictly single-process (SURVEY.md §2.6 — its only
"communication backend" is the serving socket). Here multi-host runs the
scaling-book recipe: ``jax.distributed`` forms the process group, a global
mesh lays the **data axis across hosts** (batch distribution over DCN) and
the **model axis within a host's ICI-adjacent chips** (Megatron TP psums
never cross DCN), and GSPMD/shard_map programs written for one host run
unchanged on the global mesh.

Validated offline with multi-process CPU groups over localhost (Gloo —
tests/test_multihost.py, the DCN stand-in this box allows); on real pods
``init_distributed()`` with no arguments uses the TPU runtime's own
coordinator discovery.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

from .mesh import DATA_AXIS, MODEL_AXIS

# Environment knobs (all optional — flags win over env, env wins over
# TPU-runtime autodetection):
ENV_COORD = "BERT_TPU_COORDINATOR"  # "host:port" of process 0
ENV_NPROC = "BERT_TPU_NUM_PROCESSES"
ENV_PID = "BERT_TPU_PROCESS_ID"


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) the jax.distributed process group.

    On TPU pods, call with no arguments — the TPU runtime supplies
    coordinator/count/id. For CPU/GPU DCN stand-ins (or explicit setups),
    pass the three values or set BERT_TPU_COORDINATOR / _NUM_PROCESSES /
    _PROCESS_ID. Safe to call once per process, before any jax computation.
    """
    coordinator = coordinator or os.environ.get(ENV_COORD)
    if num_processes is None and os.environ.get(ENV_NPROC):
        num_processes = int(os.environ[ENV_NPROC])
    if process_id is None and os.environ.get(ENV_PID):
        process_id = int(os.environ[ENV_PID])
    if coordinator is None:
        # TPU-pod path: the runtime knows the topology
        jax.distributed.initialize()
    else:
        if num_processes is None or process_id is None:
            # fail with the knobs THIS module documents, not jax's
            # internal "must specify num_processes" (review r4)
            raise ValueError(
                f"explicit coordinator {coordinator!r} needs num_processes "
                f"and process_id too (got {num_processes}/{process_id}) — "
                f"set {ENV_NPROC} and {ENV_PID} alongside {ENV_COORD}")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_mesh(tp: int = 1):
    """(data, model) mesh over ALL processes' devices.

    jax.devices() orders devices process-major, so reshaping to
    (n_global // tp, tp) keeps each model-axis group inside one process —
    TP collectives ride ICI, only data-axis (DP) traffic crosses DCN. ``tp``
    must divide the per-process device count for that to hold; validated
    here rather than silently spanning hosts with psums.
    """
    devs = jax.devices()
    n_local = len(jax.local_devices())
    if tp > 1 and n_local % tp:
        raise ValueError(
            f"tp={tp} must divide local device count {n_local} so TP "
            "collectives stay on ICI (never DCN)")
    if len(devs) % tp:
        raise ValueError(f"tp={tp} must divide global device count "
                         f"{len(devs)}")
    from jax.sharding import Mesh

    arr = np.array(devs).reshape(len(devs) // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def host_local_batch_to_global(mesh, *arrays):
    """Each process contributes its local batch rows; returns global arrays
    sharded over the mesh's data axis (the standard DCN data-distribution
    pattern: every host feeds its own input slice)."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    out = tuple(
        multihost_utils.host_local_array_to_global_array(
            # per-array spec: mixed-rank batches (ids [B,T] + lengths [B])
            # must each get a rank-matched spec (review r4)
            a, mesh, P(DATA_AXIS, *([None] * (a.ndim - 1))))
        for a in arrays
    )
    return out if len(out) > 1 else out[0]


def global_to_host_local(mesh, array):
    """Inverse of :func:`host_local_batch_to_global` for results."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    spec = P(DATA_AXIS, *([None] * (array.ndim - 1)))
    return multihost_utils.global_array_to_host_local_array(array, mesh,
                                                            spec)


def allgather(x, tiled: bool = True):
    """Assemble a (possibly non-fully-addressable) global array onto every
    process as numpy. ``tiled=True`` concatenates shards along axis 0 (the
    only mode supported for global arrays); replicated scalars are already
    fully addressable — just ``np.asarray`` those."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=tiled))
