"""Subprocess worker for test_multiprocess.py: one of two jax.distributed
processes running stage-1 CLIP training over a global dp=4 mesh (2 local
CPU devices each). Exercises the REAL multi-host path end-to-end:
create_multihost_mesh (jax.distributed init), DataLoader process shards,
shard_batch -> make_array_from_process_local_data, grad all-reduce across
processes — the capability the reference can only test by launching 8
physical GPUs (SURVEY.md §4).

Usage: python _mp_stage1_worker.py <process_id> <coordinator_port> <outdir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    outdir = sys.argv[3]

    from hsenet_tpu.configs import (
        BertConfig,
        CLIPConfig,
        MeshConfig,
        TrainConfig,
        ViT3DConfig,
    )
    from hsenet_tpu.data.datasets import (
        DataArgs,
        DataLoader,
        SyntheticCTDataset,
    )
    from hsenet_tpu.models.clip import CLIPModel
    from hsenet_tpu.parallel.mesh import create_multihost_mesh
    from hsenet_tpu.train.stage1 import make_stage1_train_step
    from hsenet_tpu.train.train_state import TrainState
    from hsenet_tpu.train.trainer import Trainer

    mesh = create_multihost_mesh(
        MeshConfig(dp=4, tp=1),
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    cfg = CLIPConfig(
        vision=ViT3DConfig(
            image_size=(4, 16, 16), patch_size=(2, 8, 8), hidden_size=16,
            mlp_dim=32, num_layers=1, num_heads=2,
        ),
        text=BertConfig(
            vocab_size=512, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_position_embeddings=32,
        ),
        projection_dim=16,
    )
    model = CLIPModel(cfg)
    ds = SyntheticCTDataset(
        n=8, shape=(1, 4, 16, 16), mode="clip", args=DataArgs(max_text_len=16)
    )
    for i in range(len(ds)):
        ds[i]  # warm SimpleTokenizer vocab in index order (see test_trainer)

    train_cfg = TrainConfig(
        total_steps=2, learning_rate=1e-3, log_every=1, eval_every=0,
        checkpoint_every=1000,
    )
    probe = next(iter(DataLoader(ds, 2, shuffle=False)))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(probe["image"]),
        jnp.asarray(probe["input_ids"]),
        jnp.asarray(probe["attention_mask"]),
    )
    import optax

    # SGD, not Adam: cross-process Gloo all-reduce vs single-program psum
    # changes f32 summation order by ~1e-7; Adam's normalization amplifies
    # that on near-zero grads and the param-equality check would flake
    tx = optax.sgd(1e-2)
    state = TrainState.create(params, tx)
    step_fn = make_stage1_train_step(model, tx, mesh)

    trainer = Trainer(
        step_fn,
        state,
        lambda: DataLoader(
            ds, 2, shuffle=True, seed=train_cfg.seed,
            num_shards=2, shard_index=pid,
        ),
        train_cfg,
        mesh=mesh,
    )
    final = trainer.fit()

    losses = [row["loss"] for row in trainer.history]
    leaves = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(final.params))]
    np.savez(
        os.path.join(outdir, f"proc{pid}.npz"),
        losses=np.asarray(losses, np.float64),
        step=int(final.step),
        *leaves,
    )
    print(f"proc {pid} done: step={int(final.step)} losses={losses}", flush=True)


if __name__ == "__main__":
    main()
