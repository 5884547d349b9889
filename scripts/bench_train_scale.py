"""Native-trainer sanity run at bart-base scale on the real chip.

The native pjit trainer replaced the reference's external fairseq pipeline
(`/root/reference/scripts/training/training_fairseq.sh:14-50`) but had only
ever trained d128 toys (round-3 verdict).  This runs a few hundred
label-smoothed-CE steps of genuine bart-base (139M params, BART vocab) on
synthetic span->query pairs, prints the loss curve, and exercises an
orbax save -> restore -> resume round-trip mid-run (the loss must continue,
not reset).

Usage: python scripts/bench_train_scale.py [steps] [batch]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from seal_tpu.models.config import bart_base
    from seal_tpu.training import checkpoint as ckpt
    from seal_tpu.training import trainer

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    src_len, tgt_len, vocab = 64, 24, 50265

    cfg = bart_base()
    tcfg = trainer.TrainConfig(learning_rate=1e-4, warmup_steps=50, total_steps=steps)
    params, opt_state = trainer.init_train_state(cfg, tcfg, jax.random.PRNGKey(0))
    step_fn, _ = trainer.make_train_step(cfg, tcfg)
    step_fn = jax.jit(step_fn, donate_argnums=(0, 1))

    # learnable synthetic task: the target is a marked span of the source
    # (the unsupervised data recipe's shape, scripts/training in the
    # reference); token stream is Zipf so the embedding sees a natural
    # frequency profile
    rng = np.random.default_rng(0)

    def make_batch():
        src = (rng.zipf(1.3, size=(batch, src_len)) % (vocab - 10) + 4).astype(np.int32)
        start = rng.integers(0, src_len - (tgt_len - 2), size=batch)
        tgt = np.full((batch, tgt_len), 2, np.int32)
        for r in range(batch):
            tgt[r, : tgt_len - 1] = src[r, start[r] : start[r] + tgt_len - 1]
        b = {
            "src_ids": src,
            "src_mask": np.ones((batch, src_len), np.int32),
            "tgt_in": np.concatenate(
                [np.full((batch, 1), cfg.decoder_start_token_id, np.int32), tgt[:, :-1]], 1
            ),
            "tgt_out": tgt,
        }
        return b

    losses = {}
    t0 = time.time()
    params, opt_state, loss = step_fn(params, opt_state, make_batch())
    jax.block_until_ready(loss)
    compile_s = time.time() - t0
    losses[0] = float(loss)

    ckpt_dir = tempfile.mkdtemp(prefix="bart_base_ckpt_")
    t0 = time.time()
    resumed_at = steps // 2
    try:
        for step in range(1, steps + 1):
            params, opt_state, loss = step_fn(params, opt_state, make_batch())
            if step in (steps // 4, resumed_at, 3 * steps // 4, steps):
                losses[step] = float(loss)
            if step == resumed_at:
                ckpt.save_checkpoint(ckpt_dir, step, params, opt_state)
                # restore into fresh buffers and continue from the restored
                # state -- the resume path the CLI uses
                step_got, state = ckpt.restore_checkpoint(
                    ckpt_dir, {"params": params, "opt_state": opt_state}
                )
                assert step_got == resumed_at, step_got
                params, opt_state = state["params"], state["opt_state"]
        jax.block_until_ready(loss)
        train_s = time.time() - t0
    finally:
        shutil.rmtree(ckpt_dir, ignore_errors=True)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    toks_per_s = steps * batch * (src_len + tgt_len) / train_s
    print(json.dumps({
        "model": "bart-base",
        "params_m": round(n_params / 1e6, 1),
        "steps": steps,
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "steps_per_s": round(steps / train_s, 2),
        "tokens_per_s": round(toks_per_s),
        "loss_curve": {str(k): round(v, 3) for k, v in sorted(losses.items())},
        "resume_at": resumed_at,
        "device": getattr(jax.devices()[0], "device_kind", "?"),
    }))


if __name__ == "__main__":
    main()
