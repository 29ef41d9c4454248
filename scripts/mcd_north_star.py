"""MCD north star (BASELINE.md:25): run the SAME trained weights through
BOTH stacks and measure the dB between them.

Train (or reuse) a masg_tpu checkpoint, export it to a reference-format torch
checkpoint (cli/convert_checkpoint --to_torch), strict-load it into the
reference torch FastSpeech2 (/root/reference/model/fastspeech2.py:52-174),
run both stacks on the same val utterances — free-running (predicted
durations, the honest synthesize.py path) AND teacher-forced — and print the
inter-stack MCD. The "< 0.5 dB vs the reference checkpoint" target was
previously argued via forward-parity tests (atol 2e-4); this produces the
measured number.

    python scripts/mcd_north_star.py --out /tmp/mcd_star --train_steps 2000
    python scripts/mcd_north_star.py --config <cfg_dir> --step N --out ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def _import_ref_fs2():
    """Import the reference model/fastspeech2.py without its package
    __init__ (drags in POT + GE2E hardcoded paths) — same seam as
    tests/test_torch_parity.py."""
    import importlib
    import types

    for name, attrs in [("unidecode", {"unidecode": lambda s: s}),
                        ("inflect", {"engine": lambda: None})]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for a, v in attrs.items():
                setattr(mod, a, v)
            sys.modules[name] = mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    pkg = types.ModuleType("refmodel")
    pkg.__path__ = [os.path.join(REF, "model")]
    sys.modules["refmodel"] = pkg
    return importlib.import_module("refmodel.fastspeech2")


def _ref_config_dicts(cfg):
    """Reference-format (preprocess, model) config dicts mirroring this
    experiment's dims, so the exported state_dict strict-loads."""
    tr = cfg.model.transformer
    vp = cfg.model.variance_predictor
    ve = cfg.model.variance_embedding
    pre = {
        "mel": {"n_mel_channels": cfg.preprocess.mel.n_mel_channels},
        "pitch": {"feature": cfg.preprocess.pitch.feature},
        "energy": {"feature": cfg.preprocess.energy.feature},
        "speaker_generation": {
            "metadata": cfg.preprocess.speaker_generation.metadata},
    }
    mdl = {
        "transformer": {
            "encoder_layer": tr.encoder_layer, "encoder_head": tr.encoder_head,
            "encoder_hidden": tr.encoder_hidden,
            "decoder_layer": tr.decoder_layer, "decoder_head": tr.decoder_head,
            "decoder_hidden": tr.decoder_hidden,
            "conv_filter_size": tr.conv_filter_size,
            "conv_kernel_size": list(tr.conv_kernel_size),
            "encoder_dropout": tr.encoder_dropout,
            "decoder_dropout": tr.decoder_dropout,
        },
        "variance_predictor": {"filter_size": vp.filter_size,
                               "kernel_size": vp.kernel_size,
                               "dropout": vp.dropout},
        "variance_embedding": {"pitch_quantization": ve.pitch_quantization,
                               "energy_quantization": ve.energy_quantization,
                               "n_bins": ve.n_bins},
        "jdit": {"use_jdit": False},
        "multi_speaker": True,
        "max_seq_len": cfg.model.max_seq_len,
        "speaker_generation": {
            "GMM_mixtures": cfg.model.speaker_generation.GMM_mixtures},
    }
    return pre, mdl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None,
                    help="existing experiment config dir (skip training)")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--train_steps", type=int, default=2000)
    ap.add_argument("--n_utts", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="keep the synthetic config's 64-hidden dims instead "
                         "of the full reference 35M dims")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from masg_tpu.core.config import load_config_dir

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()

    def mark(msg):
        print(f"[+{time.time()-t0:7.1f}s] {msg}", flush=True)

    if args.config is None:
        import yaml

        from masg_tpu.cli.train import main as train_main
        from masg_tpu.data.synthetic import build_synthetic_experiment_dir

        cfg_dir = build_synthetic_experiment_dir(
            args.out, n_speakers=4, utts_per_speaker=20, style="vocal",
            languages=("ja", "ja", "en", "en"), batch_size=8, group_size=1,
            total_step=args.train_steps, log_step=500, val_step=10**9,
            synth_step=10**9, save_step=args.train_steps, warm_up_step=100)
        if not args.tiny:
            # the north star is about the FULL 35M configuration
            # (reference config/JVS-VCTK/model.yaml dims)
            mp = os.path.join(cfg_dir, "model.yaml")
            with open(mp) as f:
                my = yaml.safe_load(f)
            my["transformer"].update(
                encoder_layer=4, encoder_hidden=256, decoder_layer=6,
                decoder_hidden=256, conv_filter_size=1024)
            my["variance_predictor"]["filter_size"] = 256
            with open(mp, "w") as f:
                yaml.dump(my, f)
        mark(f"corpus + preprocess ({cfg_dir})")
        train_main(["-c", cfg_dir, "--max_steps", str(args.train_steps),
                    "--seed", "0"])
        step = args.train_steps
        mark(f"trained {step} steps")
    else:
        cfg_dir, step = args.config, args.step
        assert step is not None, "--step required with --config"

    cfg = load_config_dir(cfg_dir)

    # --- export the checkpoint to the reference torch format ---
    from masg_tpu.cli.convert_checkpoint import main as convert_main

    pth = os.path.join(args.out, f"{step}.pth.tar")
    convert_main(["-c", cfg_dir, "--step", str(step), "--to_torch", pth,
                  "--skip_optimizer"])
    mark(f"exported {pth}")

    # --- same val inputs for both stacks ---
    from masg_tpu.data.dataset import Dataset
    from masg_tpu.train.loop import build_corpus_dict

    corpora = list(getattr(cfg, "corpora", {}) or {})
    if not corpora:
        raise SystemExit("config has no corpus")
    cdict = build_corpus_dict(cfg, corpora[0])
    ds = Dataset("val.txt", cdict, batch_size=args.n_utts, sort=False)
    items = [ds[i] for i in range(min(args.n_utts, len(ds)))]
    batch = ds.collate(items)[0]
    mark(f"val batch: {len(items)} utts, L={batch['texts'].shape[1]}, "
         f"T={batch['mels'].shape[1]}")

    # --- masg_tpu forward (real TPU) ---
    from masg_tpu.infer.synthesis import load_model

    model, variables = load_model(cfg, restore_step=step)
    L = batch["texts"].shape[1]
    T_cap = int(batch["mels"].shape[1] * 2 + 64)

    def run_jax(teacher_forced):
        kw = dict(
            accents=jnp.asarray(batch["accents"]),
            speaker_meta=jnp.asarray(batch["speaker_meta"]),
        )
        if teacher_forced:
            kw.update(
                mels=jnp.asarray(batch["mels"]),
                mel_lens=jnp.asarray(batch["mel_lens"]),
                p_targets=jnp.asarray(batch["pitches"]),
                e_targets=jnp.asarray(batch["energies"]),
                d_targets=jnp.asarray(batch["durations"]),
            )
        out = jax.jit(lambda v: model.apply(
            v, jnp.asarray(batch["speakers"]), jnp.asarray(batch["texts"]),
            jnp.asarray(batch["src_lens"]),
            batch["mels"].shape[1] if teacher_forced else T_cap, **kw))(variables)
        return (np.asarray(out.postnet_mel, np.float64),
                np.asarray(out.mel_len, np.int64))

    jax_free, jax_free_len = run_jax(False)
    jax_tf, jax_tf_len = run_jax(True)
    mark("masg_tpu forwards done")

    # --- reference torch forward (CPU) with the exported weights ---
    import torch

    fs2_mod = _import_ref_fs2()
    pre, mdl = _ref_config_dicts(cfg)
    ref = fs2_mod.FastSpeech2(pre, mdl, cfg_dir)
    sd = torch.load(pth, map_location="cpu", weights_only=True)["model"]
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    def run_torch(teacher_forced):
        kw = dict(
            accents=torch.from_numpy(batch["accents"].astype(np.int64)),
            speaker_meta=torch.from_numpy(
                batch["speaker_meta"].astype(np.float32)),
        )
        if teacher_forced:
            kw.update(
                mels=torch.from_numpy(batch["mels"].astype(np.float32)),
                mel_lens=torch.from_numpy(batch["mel_lens"].astype(np.int64)),
                max_mel_len=batch["mels"].shape[1],
                p_targets=torch.from_numpy(batch["pitches"].astype(np.float32)),
                e_targets=torch.from_numpy(batch["energies"].astype(np.float32)),
                d_targets=torch.from_numpy(batch["durations"].astype(np.int64)),
            )
        with torch.no_grad():
            out = ref(
                torch.from_numpy(batch["speakers"].astype(np.int64)),
                torch.from_numpy(batch["texts"].astype(np.int64)),
                torch.from_numpy(batch["src_lens"].astype(np.int64)),
                L, **kw)
        # non-jdit return: (output, postnet, p, e, log_d, d_rounded,
        #                   src_masks, mel_masks, src_lens, mel_lens, prior...)
        postnet = out[1].double().numpy()
        mel_lens = out[9]
        return postnet, np.asarray(mel_lens, np.int64).reshape(-1)

    torch_free, torch_free_len = run_torch(False)
    torch_tf, torch_tf_len = run_torch(True)
    mark("reference torch forwards done")

    # --- inter-stack MCD ---
    from masg_tpu.utils.mcd import mcd

    def compare(a, a_len, b, b_len, label):
        scores, mismatches = [], 0
        for i in range(a.shape[0]):
            na, nb = int(a_len[i]), int(b_len[i])
            if na != nb:
                mismatches += 1
            n = min(na, nb, a.shape[1], b.shape[1])
            if n > 8:
                scores.append(mcd(a[i, :n], b[i, :n]))
        row = {"label": label, "mcd_db_mean": round(float(np.mean(scores)), 4),
               "mcd_db_max": round(float(np.max(scores)), 4),
               "n_utts": len(scores), "duration_mismatches": mismatches}
        print(json.dumps(row), flush=True)
        return row

    rows = [
        compare(jax_free, jax_free_len, torch_free, torch_free_len,
                "free_running"),
        compare(jax_tf, jax_tf_len, torch_tf, torch_tf_len, "teacher_forced"),
    ]
    with open(os.path.join(args.out, "mcd_north_star.json"), "w") as f:
        json.dump({"step": step, "rows": rows,
                   "target_db": 0.5, "wall_s": round(time.time() - t0, 1)}, f,
                  indent=1)
    ok = all(r["mcd_db_mean"] < 0.5 for r in rows)
    print(f"north star {'MET' if ok else 'MISSED'}: "
          f"target < 0.5 dB, wall {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
