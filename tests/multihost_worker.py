"""Two-process multi-host smoke worker (driven by tests/test_multihost.py).

Each process: jax.distributed bring-up over a localhost coordinator
(``runtime/mesh.init_distributed``), a (1, 4) global mesh spanning both
processes' fake CPU devices, and ONE sharded train step on a toy graph —
exercising the multi-host path (cross-process collectives included) that a
real TPU pod would use, before it ever meets real hardware.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints "RESULT <pid> <n_global_devices> <loss>" on success.
"""
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon

    from lgcnhs_tpu.runtime.mesh import init_distributed, make_mesh

    n_devices = init_distributed(f"localhost:{port}", nproc, pid)
    assert n_devices == 4, n_devices
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    import optax

    from lgcnhs_tpu.config import load_config
    from lgcnhs_tpu.data.graph import EdgeSet, normalized_bipartite, pos_bool_matrix
    from lgcnhs_tpu.models.lightgcn import init_lightgcn
    from lgcnhs_tpu.parallel.sharding import (
        make_plan,
        make_sharded_train_step,
        shard_params,
        shard_train_inputs,
    )
    from lgcnhs_tpu.train.trainer import lr_schedule

    U, I, D = 32, 64, 8
    rng = np.random.default_rng(5)
    pairs = np.unique(
        np.stack([rng.integers(0, U, 400), rng.integers(0, I, 400)]), axis=1
    )
    es = EdgeSet(pairs[0].astype(np.int32), pairs[1].astype(np.int32))

    mesh = make_mesh((1, 4))  # spans both processes
    plan = make_plan(mesh)
    R_hat, pos_mask, eu, ei = shard_train_inputs(
        plan, normalized_bipartite(U, I, es), pos_bool_matrix(U, I, es),
        es.users, es.items,
    )
    params = shard_params(plan, init_lightgcn(jax.random.PRNGKey(0), U, I, D))

    cfg = load_config(env="dev", dataset="synthetic", model="LightGCN")
    hp = cfg.hparams.__class__(
        **{**cfg.hparams.__dict__, "batch_size": 32, "embedding_dim": D}
    )
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr_schedule(hp.lr, hp.gamma, hp.epoch_per_lr_decay)
    )
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(plan, optimizer, hp, I)
    params, opt_state, loss = step(
        params, opt_state, jax.random.PRNGKey(1), R_hat, eu, ei, pos_mask
    )

    loss = float(loss)  # replicated global array: addressable on every host
    assert np.isfinite(loss), loss
    print(f"RESULT {pid} {n_devices} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
