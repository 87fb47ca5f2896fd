"""Worker process for the real two-process pod-path test
(tests/test_multiprocess.py). Each OS process owns 2 virtual CPU devices;
together they form one 4-device global mesh. Runs: distributed init via the
env contract -> per-host sharded DataLoader (decodes ONLY its slice) -> one
sharded β-VAE-GAN train step. Prints one JSON line the parent compares
across processes (SPMD: every value must match bit-for-bit)."""

import json
import os
import sys


def main() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.data.pipeline import get_data_loader
    from disentangle_mlp_tpu.parallel.mesh import (
        batch_sharding, make_mesh, maybe_initialize_distributed, replicate)
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    maybe_initialize_distributed()
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 2 * nproc

    mesh = make_mesh()
    sharding = batch_sharding(mesh)

    cfg = Config(
        name=f"mp{jax.process_index()}", epochs=1, batch_size_train=8,
        n_hidden=8, img_size=32, n_z=[8, 4, 4], representation_size=4,
        head_width=32, decoder_channels=[8, 8, 8],
        disc_channels=[4, 8, 8, 8], disc_feature_dim=32, dtype="float32",
        lr=1e-3, synthetic_data=True, synthetic_train_size=16,
        num_workers=2, beta=25.0,
    )

    train, _, _ = get_data_loader(cfg, sharding=sharding)
    assert train.process_count == nproc
    x, y = next(iter(train))
    assert x.shape == (8, 32, 32, 3), x.shape
    # each process holds only its slice of the global batch
    local_rows = sum(s.data.shape[0] for s in x.addressable_shards)
    assert local_rows == 8 // nproc, local_rows
    batch_sum = float(jax.jit(lambda a: jax.numpy.sum(a))(x))

    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    eg = replicate(exp.eg_state, mesh)
    d = replicate(exp.d_state, mesh)
    eg2, _, m = exp.train_step(eg, d, x, jax.random.key(1))
    recon = float(m["recon_enc"])
    assert recon == recon, "NaN"
    leaf = jax.tree_util.tree_leaves(eg2.params)[0]
    p0 = float(jax.numpy.sum(jax.numpy.abs(leaf)))

    record = {"proc": jax.process_index(), "batch_sum": batch_sum,
              "recon": recon, "param_l1": p0}

    if os.environ.get("DMT_MP_FID"):
        # Sharded FID extraction on a pod: every host runs the Inception
        # pool3 forward over its own LOCAL devices (eval/fid.py
        # get_activations — a global mesh cannot device_put host batches),
        # so identical inputs must give bit-identical activations on every
        # host (the per-epoch FID of a pod run depends on it).
        import numpy as np

        from disentangle_mlp_tpu.eval.fid import get_activations

        # deterministic host-local input (a sharded global batch is not
        # fully addressable from one host): the synthetic source hashes
        # per-index, so every host materializes the same 4 images
        from disentangle_mlp_tpu.data.pipeline import SyntheticSource

        src = SyntheticSource(size=16, img_size=32, seed=7)
        imgs, _ = src.load_batch(np.arange(4))
        acts = get_activations(((imgs + 1.0) / 2.0).astype(np.float32),
                               batch_size=4, shard=True)
        record["acts_sum"] = float(np.float32(acts.sum()))
        record["acts_head"] = [float(v) for v in acts[0, :4]]

    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
