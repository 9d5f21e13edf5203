"""Training entry point.

Public flags mirror the reference CLI (reference: train.py:135-143):
``--batch_size --lr --max_steps --w_codec --w_dur --w_smsd`` (``--device`` is
meaningless under JAX device selection and becomes ``--mesh``), plus the
additions the reference lacks: checkpointing/resume, structured metrics,
``--synthetic`` smoke data, and dp/tp mesh scaling.

    python -m mamba_tts_tpu.train.train --synthetic --max_steps 2

The train step is one jitted function over the whole MambaTTS param tree;
on a multi-device mesh, parameters follow the Megatron-style partition rules
of ``parallel/mesh.py`` and the batch is sharded on the data axis — XLA
inserts the collectives.
"""
from __future__ import annotations

import argparse
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu import config as config_lib
from mamba_tts_tpu.config import TTSConfig
from mamba_tts_tpu.models.tts import MambaTTS
from mamba_tts_tpu.train import state as state_lib


def build_model(cfg: TTSConfig, sp_mesh=None) -> MambaTTS:
    return MambaTTS(cfg, sp_mesh=sp_mesh)


def init_params(model: MambaTTS, cfg: TTSConfig, rng: jax.Array):
    """Initialize the full param tree from a tiny fake batch."""
    B, L, S = 2, 8, 8
    Q = cfg.decoder.num_quantizers
    batch = {
        "phoneme_ids": jnp.ones((B, L), jnp.int32),
        "text_mask": jnp.ones((B, L), bool),
        "style_bert": jnp.zeros((B, cfg.smsd.bert_dim), jnp.float32),
        "spk_embs": jnp.zeros((B, cfg.smsd.style_dim), jnp.float32),
        "target_codec": jnp.full((B, S, Q), 2, jnp.int32),
        "target_frames": jnp.full((B,), S, jnp.int32),
        "voice_codec": jnp.full((B, S, Q), 2, jnp.int32),
    }
    init_rng, sample_rng, drop_rng, noise_rng = jax.random.split(rng, 4)
    # use_nar_branch=True at init so the full param tree (incl. the style
    # pipeline, unused by the default loss) exists for checkpoints/inference.
    variables = model.init(
        {"params": init_rng, "dropout": drop_rng, "noise": noise_rng},
        batch,
        sample_rng,
        use_nar_branch=True,
        method=MambaTTS.compute_losses,
    )
    return variables["params"]


def make_train_step_fn(model: MambaTTS, tx, use_nar_branch: bool = False):
    """The raw (un-jitted) train step — (params, opt_state, batch, rng) ->
    (params, opt_state, losses).  Exposed so harnesses can lax.scan N steps
    inside one jit (returning only scalars: on the tunneled TPU backend,
    call outputs ship to the host, so a step that returns the param pytree
    times the tunnel, not the step)."""

    def loss_fn(params, batch, rngs, sample_rng):
        losses = model.apply(
            {"params": params},
            batch,
            sample_rng,
            deterministic=False,
            use_nar_branch=use_nar_branch,
            rngs=rngs,
            method=MambaTTS.compute_losses,
        )
        return losses["loss_total"], losses

    def train_step(params, opt_state, batch, rng):
        drop_rng, noise_rng, sample_rng = jax.random.split(rng, 3)
        rngs = {"dropout": drop_rng, "noise": noise_rng}
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rngs, sample_rng
        )
        import optax

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return train_step


def make_train_step(model: MambaTTS, tx, use_nar_branch: bool = False):
    return partial(jax.jit, donate_argnums=(0, 1))(
        make_train_step_fn(model, tx, use_nar_branch)
    )


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--max_steps", type=int, default=10,
                        help="short run for sanity check")
    parser.add_argument("--w_codec", type=float, default=1.0)
    parser.add_argument("--w_dur", type=float, default=0.1)
    parser.add_argument("--w_smsd", type=float, default=0.5)
    parser.add_argument("--csv_path", type=str, default="VccmDataset/controlspeech_train.csv")
    parser.add_argument("--audio_root", type=str, default="TextrolSpeech_data.tar.gz")
    parser.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    parser.add_argument("--checkpoint_every", type=int, default=100)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--synthetic", action="store_true",
                        help="run on a generated synthetic dataset (smoke test)")
    parser.add_argument("--preprocessed_dir", type=str, default=None,
                        help="train from an offline-preprocessed directory "
                             "(data/preprocess.py output) — no G2P/BERT/codec "
                             "work in the loop")
    parser.add_argument("--config_json", type=str, default=None)
    parser.add_argument("--bert_vocab", type=str, default=None,
                        help="path to a real BERT vocab.txt for the style-"
                             "text encoder; without it the WordPiece "
                             "tokenizer uses a hash vocabulary (warns)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="mesh shape as 'data,model', e.g. '4,2'")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--loader", choices=["batches", "grain"], default="batches",
                        help="online-path input pipeline: plain dataset.batches "
                             "or the grain loader (prefetch + worker offload)")
    parser.add_argument("--grain_workers", type=int, default=0,
                        help="grain worker processes (0 = in-process)")
    parser.add_argument("--log_file", type=str, default=None,
                        help="append per-step JSON metric lines to this file")
    parser.add_argument("--tensorboard_dir", type=str, default=None)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 2-4 here")
    args = parser.parse_args(argv)

    cfg = (
        config_lib.from_json(open(args.config_json).read())
        if args.config_json
        else TTSConfig()
    )
    cfg = config_lib.override(cfg, "train.batch_size", args.batch_size)
    cfg = config_lib.override(cfg, "train.lr", args.lr)
    cfg = config_lib.override(cfg, "train.max_steps", args.max_steps)
    cfg = config_lib.override(cfg, "train.w_codec", args.w_codec)
    cfg = config_lib.override(cfg, "train.w_dur", args.w_dur)
    cfg = config_lib.override(cfg, "train.w_smsd", args.w_smsd)
    if args.bert_vocab:
        cfg = config_lib.override(cfg, "style_encoder.bert_vocab", args.bert_vocab)

    # Mesh first: the model needs it at construction when the config asks for
    # sequence-parallel scans (decoder.use_sp_scan).
    mesh = None
    if args.mesh:
        from mamba_tts_tpu.parallel.mesh import make_mesh

        shape = tuple(int(x) for x in args.mesh.split(","))
        mesh = make_mesh(shape, ("data", "model"))

    # Data: either the online path (raw CSV + tar, front-ends in the loop)
    # or the offline-preprocessed path (ready tensors).
    offline = None
    if args.preprocessed_dir:
        from mamba_tts_tpu.data.preprocess import OfflineDataset

        offline = OfflineDataset(args.preprocessed_dir)
        print(f"offline dataset: {len(offline)} items from {args.preprocessed_dir}")

        def batch_iter(epoch_seed):
            return offline.batches(
                cfg.train.batch_size,
                max_text_len=cfg.data.max_text_len,
                seed=epoch_seed,
            )
    else:
        if args.synthetic:
            import tempfile

            from mamba_tts_tpu.data.dataset import make_synthetic_dataset

            tmp = tempfile.mkdtemp(prefix="mtts_synth_")
            csv_path, audio_root = make_synthetic_dataset(
                tmp, n_items=max(8, args.batch_size * 2)
            )
        else:
            csv_path, audio_root = args.csv_path, args.audio_root

        from mamba_tts_tpu.data.dataset import VccmTTSDataset
        from mamba_tts_tpu.train.pipeline import BatchPreparer

        dataset = VccmTTSDataset(csv_path, audio_root, cfg.data.sample_rate, seed=args.seed)
        print(f"dataset: {len(dataset)} items ({dataset.skipped} skipped)")
        preparer = BatchPreparer(cfg)

        if args.loader == "grain":
            from mamba_tts_tpu.data.grain_pipeline import make_grain_loader

            def batch_iter(epoch_seed):
                it = make_grain_loader(
                    dataset, cfg.train.batch_size, seed=epoch_seed,
                    worker_count=args.grain_workers,
                )
                for inputs, target_wav in it:
                    yield preparer(inputs, target_wav)
        else:

            def batch_iter(epoch_seed):
                for inputs, target_wav in dataset.batches(cfg.train.batch_size, seed=epoch_seed):
                    yield preparer(inputs, target_wav)

    # Model + optimizer.
    model = build_model(cfg, sp_mesh=mesh if cfg.decoder.use_sp_scan else None)
    rng = jax.random.PRNGKey(args.seed)
    params = init_params(model, cfg, rng)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.1f}M params")
    tx = state_lib.make_optimizer(cfg.train.lr, cfg.train.grad_clip_norm)
    train_state = state_lib.create_train_state(params, tx)
    # Persist the config next to checkpoints so inference can self-configure.
    from pathlib import Path

    Path(args.checkpoint_dir).mkdir(parents=True, exist_ok=True)
    with open(Path(args.checkpoint_dir) / "config.json", "w") as f:
        f.write(config_lib.to_json(cfg))
    if args.resume:
        train_state, restored = state_lib.restore_checkpoint(args.checkpoint_dir, train_state)
        print(f"resume: {'restored step ' + str(train_state.step) if restored else 'no checkpoint found'}")

    # Optional mesh sharding of params/batches.
    if mesh is not None:
        from mamba_tts_tpu.parallel.mesh import param_shardings, shard_batch

        shardings = param_shardings(train_state.params, mesh)
        train_state = train_state.replace(
            params=jax.tree.map(jax.device_put, train_state.params, shardings)
        )
        print(f"mesh: {dict(mesh.shape)}")

    train_step = make_train_step(model, tx)

    from mamba_tts_tpu.utils.metrics import MetricsLogger
    from mamba_tts_tpu.utils.profiling import StepTimer, trace

    logger = MetricsLogger(
        log_file=args.log_file, tensorboard_dir=args.tensorboard_dir
    )
    timer = StepTimer(skip_first=1)

    step = train_state.step
    start_step = step
    rng = jax.random.fold_in(rng, step)
    t_start = time.perf_counter()
    profiling = False
    while step < cfg.train.max_steps:
        for batch in batch_iter(step):
            if step >= cfg.train.max_steps:
                break
            if args.profile_dir and step - start_step == 2 and not profiling:
                profile_ctx = trace(args.profile_dir)
                profile_ctx.__enter__()
                profiling = True
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if mesh is not None:
                from mamba_tts_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, mesh)
            rng, step_rng = jax.random.split(rng)
            with timer:
                params, opt_state, losses = train_step(
                    train_state.params, train_state.opt_state, batch, step_rng
                )
                losses = jax.device_get(losses)
            train_state = train_state.replace(
                step=step + 1, params=params, opt_state=opt_state
            )
            tokens = int(batch["target_codec"].size)
            if step % cfg.train.log_every == 0:
                logger.log(step, losses, tokens=tokens)
            if profiling and step - start_step >= 4:
                profile_ctx.__exit__(None, None, None)
                profiling = False
                print(f"profiler trace written to {args.profile_dir}")
            step += 1
            if step % args.checkpoint_every == 0:
                state_lib.save_checkpoint(args.checkpoint_dir, train_state)
                print(f"checkpoint saved at step {step}")
    if profiling:
        profile_ctx.__exit__(None, None, None)
    if cfg.train.max_steps > 0 and step % args.checkpoint_every != 0:
        state_lib.save_checkpoint(args.checkpoint_dir, train_state)
        print(f"checkpoint saved at step {step}")
    logger.close()
    print(
        f"done: {step} steps in {time.perf_counter()-t_start:.1f}s "
        f"(steady-state {timer.mean*1e3:.0f} ms/step)"
    )


if __name__ == "__main__":
    main()
