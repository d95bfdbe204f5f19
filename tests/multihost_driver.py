"""Subprocess driver for the two-process multi-host training test.

Run as: python multihost_driver.py <proc_id> <num_procs> <port> <out_json>

Each process owns 2 virtual CPU devices; jax.distributed.initialize
federates them into one 4-device global mesh (the TPU-native equivalent
of torchrun rendezvous, reference train.py:93-106). The process loads
ONLY its sample shard (PrefetchLoader shard_rank/shard_count =
DistributedSampler semantics, train.py:157-158); Trainer.put_batch
assembles global arrays via make_array_from_process_local_data. Writes
per-step losses + the sample indices this process loaded to out_json.
"""

import json
import os
import sys


def main() -> None:
    proc_id, num_procs, port = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]))
    out_json = sys.argv[4]

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
            " --xla_cpu_enable_concurrency_optimized_scheduler=false"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Compile fresh, every run. When one process loads a persistent-cache
    # AOT executable while the other JIT-compiles (or they mix per
    # program), the two create DIFFERENT Gloo collective-context
    # sequences; the KV-store rendezvous then pairs mismatched contexts
    # and dies on its 30 s hard timeout ("GetKeyValue() timed out with
    # key: cpu:gloo/...", "Connect timeout"). Measured: cold runs pass
    # every time, warm runs fail every time. Fresh compiles are ~4 min
    # per process on this 1-core box — the price of determinism.
    jax.config.update("jax_enable_compilation_cache", False)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_procs,
                               process_id=proc_id)
    assert jax.process_count() == num_procs
    assert jax.device_count() == 2 * num_procs, jax.devices()
    assert len(jax.local_devices()) == 2

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import tiny_config
    from transfuser_tpu.data.loader import PrefetchLoader
    from transfuser_tpu.data.synthetic import synthetic_batch
    from transfuser_tpu.parallel import sharding as shd
    from transfuser_tpu.train.trainer import Trainer

    cfg = tiny_config()
    n_samples, global_batch = 16, 4
    local_batch = global_batch // num_procs

    # Deterministic synthetic dataset, identical on both processes; each
    # item carries its index so the shard split is observable.
    full = synthetic_batch(cfg, n_samples)

    class IndexedDataset:
        def __init__(self):
            self.seen = []

        def __len__(self):
            return n_samples

        def __getitem__(self, i):
            self.seen.append(i)
            return {k: np.asarray(v[i]) for k, v in full.items()}

    ds = IndexedDataset()
    loader = PrefetchLoader(ds, local_batch, shuffle=True, num_workers=1,
                            seed=7, shard_rank=proc_id,
                            shard_count=num_procs)

    mesh = shd.make_mesh(shd.MeshSpec(data=2 * num_procs, model=1))
    trainer = Trainer(cfg, mesh=mesh, dtype=jnp.float32)
    batches = list(iter(loader))

    # Gloo context setup has a hard 30 s KV-store rendezvous window; on a
    # 1-core box two processes tracing/compiling can desync past it.
    # Align at the coordination service right before the first collective
    # (init_state) and again before the step loop.
    barrier = jax._src.distributed.global_state.client.wait_at_barrier
    barrier("pre_init", 300_000)
    trainer.init_state(batches[0], seed=0)
    barrier("pre_train", 300_000)

    losses = []
    for batch in batches:
        trainer.state, metrics = trainer.train_step(
            trainer.state, trainer.put_batch(batch))
        # loss is computed over the GLOBAL batch and replicated, so both
        # processes must read the identical value.
        losses.append(float(metrics["loss_total"]))

    with open(out_json, "w") as f:
        json.dump({"proc": proc_id, "losses": losses,
                   "indices": sorted(set(ds.seen))}, f)
    print(f"proc {proc_id} done: {losses}")


if __name__ == "__main__":
    main()
