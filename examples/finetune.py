# coding: utf-8
"""Fine-tune the hybrid model on a dp×tp mesh (demo driver).

The reference is inference-only; this is the TPU-native training
extension: joint CTC + audio-conditioned LM cross-entropy over the whole
SenseVoice-encoder + Qwen3-decoder stack, Megatron-TP sharded parameters,
data-parallel batch (``parallel/training.py``). Runs on a virtual CPU
mesh for smoke-testing (the default here) or on a real TPU slice.

    python examples/finetune.py --steps 5 --dp 4 --tp 2          # virtual
    python examples/finetune.py --checkpoint model_dir --steps 100 \
        --real-devices

With --checkpoint the run warm-starts from the inference weights
(encoder/adaptor/CTC safetensors + decoder GGUF, loaded dense f32) and
saves a sharded training checkpoint every --save-every steps (resumable).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", help="warm-start from this engine "
                                         "checkpoint dir (else tiny random)")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dp", type=int, default=4)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--real-devices", action="store_true",
                    help="use the real accelerator devices; default is a "
                         "virtual CPU mesh (the safe demo mode — the "
                         "platform must be chosen BEFORE jax initializes, "
                         "so there is no reliable auto-detect)")
    ap.add_argument("--pp", type=int, default=0,
                    help="GPipe pipeline-parallel decoder-LM demo over N "
                         "stages (parallel/pipeline.py; exclusive with "
                         "--dp/--tp)")
    ap.add_argument("--save-every", type=int, default=0)
    ap.add_argument("--out", default="finetune_ckpt")
    ap.add_argument("--export",
                    help="after training, write an ENGINE checkpoint dir "
                         "here (train → deploy: create_asr_engine can "
                         "serve it directly)")
    args = ap.parse_args()

    n_dev = args.pp if args.pp else args.dp * args.tp
    if not args.real_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}").strip()
    import jax
    if not args.real_devices:
        jax.config.update("jax_platforms", "cpu")

    if args.pp:
        _run_pp_demo(args)
        return

    from fun_asr_gguf_tpu.models.config import HybridConfig
    from fun_asr_gguf_tpu.parallel.mesh import make_mesh
    from fun_asr_gguf_tpu.parallel.training import (batch_shardings,
                                                    init_train_state,
                                                    make_dummy_batch,
                                                    make_optimizer,
                                                    make_train_step,
                                                    warm_start_train_state)
    import jax.numpy as jnp

    mesh = make_mesh(dp=args.dp, tp=args.tp,
                     devices=jax.devices()[:n_dev])
    opt = make_optimizer(args.lr)
    if args.checkpoint:
        # warm-start: fine-tune the actual inference weights
        state, cfg = warm_start_train_state(args.checkpoint, opt, mesh=mesh)
    else:
        cfg = HybridConfig.tiny(ctc_vocab=64, llm_vocab=128)
        state = init_train_state(jax.random.PRNGKey(0), cfg, opt, mesh=mesh)
    step_fn = make_train_step(cfg, opt)
    bs = batch_shardings(mesh)

    print(f"mesh dp{args.dp}×tp{args.tp} on {jax.devices()[0].platform}; "
          f"{args.steps} steps, batch {args.batch}")
    for step in range(args.steps):
        # replace make_dummy_batch with your real (audio, text) pipeline
        batch = make_dummy_batch(cfg, batch=args.batch, t=16, seed=step)
        batch = {k: jax.device_put(jnp.asarray(v), bs[k])
                 for k, v in batch.items()}
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        loss = float(jax.device_get(metrics["loss"]))
        print(f"step {step:4d}  loss {loss:.4f}  "
              f"({(time.perf_counter()-t0)*1000:.0f} ms)")
        if args.save_every and (step + 1) % args.save_every == 0:
            from fun_asr_gguf_tpu.parallel.training import save_train_state
            save_train_state(args.out, state)
            print(f"  saved → {args.out}")
    if args.export:
        import shutil
        from fun_asr_gguf_tpu.models.loaders import save_checkpoint
        p = state.params
        save_checkpoint(args.export, cfg, p["encoder"], p["adaptor"],
                        p["ctc"], p["llm"])
        if args.checkpoint:
            # carry the tokenizer/vocab/hotword sidecars so the exported
            # dir is directly servable by create_asr_engine
            for name in ("tokenizer.json", "tokens.txt", "hot.txt"):
                src = os.path.join(args.checkpoint, name)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(args.export, name))
        print(f"exported engine checkpoint → {args.export}")
    print("done.")


def _run_pp_demo(args):
    """Decoder-only LM fine-tuning with the layers staged over a ('pp',)
    mesh — the microbatch schedule and its differentiated backward live
    in parallel/pipeline.py."""
    import dataclasses
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params
    from fun_asr_gguf_tpu.parallel.pipeline import (make_pp_mesh,
                                                    make_pp_train_step,
                                                    shard_layers_pp)
    from fun_asr_gguf_tpu.parallel.training import make_optimizer

    cfg = dataclasses.replace(Qwen3Config.tiny(vocab_size=128),
                              n_layers=max(args.pp, 2))
    mesh = make_pp_mesh(args.pp)
    params = shard_layers_pp(init_qwen3_params(jax.random.PRNGKey(0), cfg),
                             mesh)
    opt = make_optimizer(args.lr)
    step_fn = make_pp_train_step(cfg, opt, mesh, n_micro=max(2, args.pp))
    # (n_micro recomputed below for the batch rounding)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    print(f"pp{args.pp} pipeline on {jax.devices()[0].platform}; "
          f"{args.steps} steps, batch {args.batch}")
    n_micro = max(2, args.pp)
    for step in range(args.steps):
        # batch must split evenly into the schedule's microbatches
        b = -(-max(args.batch, n_micro) // n_micro) * n_micro
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, 16)),
                          jnp.int32)
        mask = jnp.ones((b, 16), jnp.float32)
        t0 = time.perf_counter()
        params, opt_state, metrics = step_fn(params, opt_state, ids, mask)
        loss = float(jax.device_get(metrics["loss"]))
        print(f"step {step:4d}  loss {loss:.4f}  "
              f"({(time.perf_counter()-t0)*1000:.0f} ms)")
    print("done.")


if __name__ == "__main__":
    main()
