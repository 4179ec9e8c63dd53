"""Worker for tests/test_multihost.py: one process of a 2-process CPU
group (localhost DCN stand-in). Runs sharded inference + one GSPMD train
step on the GLOBAL mesh and checks against the locally-computed truth.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

from bert_tpu.cache import enable_compilation_cache

enable_compilation_cache()  # workers re-spawn per test run: cache compiles

import numpy as np


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from bert_tpu.parallel.multihost import (
        allgather,
        global_mesh,
        host_local_batch_to_global,
        init_distributed,
    )

    init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp

    from bert_tpu.model import bert_forward
    from bert_tpu.params import (
        BertConfig,
        params_from_named_tensors,
        random_named_tensors,
    )
    from bert_tpu.parallel.spmd import make_sharded_encode_fn, shard_params

    config = BertConfig(n_vocab=128, n_max_tokens=32, n_embd=64,
                        n_intermediate=128, n_head=4, n_layer=2)
    params = params_from_named_tensors(random_named_tensors(config, seed=3),
                                       config)

    # tp=2 stays inside each process's 4 local devices; data axis (4) spans
    # the two processes → DP traffic is the only cross-"host" traffic
    mesh = global_mesh(tp=2)
    n_global = 4 * nproc  # 4 forced local devices per process
    assert dict(mesh.shape) == {"data": n_global // 2, "model": 2}
    sp = shard_params(mesh, params)

    b_global, t = 8, 16
    b_local = b_global // nproc
    rng = np.random.default_rng(0)  # same stream everywhere
    ids_all = rng.integers(0, config.n_vocab, size=(b_global, t),
                           dtype=np.int32)
    mask_all = np.ones((b_global, t), np.float32)
    mask_all[:, t // 2:] = 0.0
    lo = pid * b_local
    ids_g, mask_g = host_local_batch_to_global(
        mesh, ids_all[lo: lo + b_local], mask_all[lo: lo + b_local])

    encode = make_sharded_encode_fn(mesh, config, use_pallas=False,
                                    compute_dtype=jnp.float32)
    out = encode(sp, ids_g, mask_g)
    got = allgather(out)  # tiled: assembled [B_global, D]
    assert got.shape == (b_global, config.n_embd)

    ref = np.asarray(bert_forward(params, jnp.asarray(ids_all),
                                  jnp.asarray(mask_all), config))
    err = float(np.abs(got - ref).max())
    assert err < 3e-5, f"sharded-vs-local inference drift {err}"

    # one GSPMD train step across the group (gradients allreduce over DCN)
    from bert_tpu.train import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
    )

    optimizer = make_optimizer(learning_rate=1e-3)
    state = init_train_state(params, optimizer)
    placed, step = make_sharded_train_step(mesh, config, optimizer, state)
    batch = {
        "ids_a": ids_g, "mask_a": mask_g,
        "ids_b": ids_g, "mask_b": mask_g,
    }
    placed, metrics = step(placed, batch)
    loss = float(np.asarray(metrics["loss"]))  # replicated scalar
    assert np.isfinite(loss), loss

    print(f"MULTIHOST_OK pid={pid} err={err:.2e} loss={loss:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
