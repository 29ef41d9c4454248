"""Run the reference's FULL training schedule at reference scale on silicon
(VERDICT r5 items 2 + 7).

Reference recipe (/root/reference/train.sh:12-19 + config/JVS-VCTK/
train.yaml:16 + config/JVS-VCTK_langemb_configs/JVS-VCTK_1/train.yaml:17):
30k-step multi-speaker pretrain on the merged JVS+VCTK bilingual corpus,
then a 50k-step `--use_clf` langemb fine-tune warm-started from the
pretrain, with a separately-pretrained GE2E discriminator.

This drives the same schedule end-to-end on one TPU v5e:

  corpus   two reference-shaped synthetic corpora (JVS-like: ja speakers;
           VCTK-like: en speakers; ~3-5 s utterances) -> preprocess (per-
           corpus normalization off) -> gather (global stats + speakers),
           exercising the 100+-speaker path the reference was built for
           (gather.py:1-74, config/JVS/preprocess_JVS.yaml)
  pretrain 30,000 steps, batch 16 x group 4, warm_up 4000, SCALED anneal
           steps [12k, 18k, 24k] x 0.3 so the Noam anneal path fires
           end-to-end, save cadence 2000 with keep_last rotation, val at
           reference-like cadence; ONE MID-RUN SIGTERM KILL + RESUME
  clf      50,000-step --use_clf fine-tune at lambda=1 from the 30k ckpt
  mcd      free-running + teacher-forced cross-stack MCD of the 30k model
           via scripts/mcd_north_star.py --config

    python scripts/reference_scale_run.py --out /tmp/refscale --stage corpus
    python scripts/reference_scale_run.py --out /tmp/refscale --stage pretrain
    python scripts/reference_scale_run.py --out /tmp/refscale --stage clf
    python scripts/reference_scale_run.py --out /tmp/refscale --stage mcd
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SPK_PER_CORPUS = 52          # 104 total: JVS=100ja + VCTK=109en shape
UTTS_PER_SPK = 12
PRETRAIN_STEPS = 30000
CLF_STEPS = 50000
KILL_AT_STEP = 11000           # mid-run SIGTERM during pretrain


def _evidence_path(out):
    return os.path.join(out, "refscale_evidence.json")


def _load_evidence(out):
    p = _evidence_path(out)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_evidence(out, ev):
    with open(_evidence_path(out), "w") as f:
        json.dump(ev, f, indent=1)


def stage_corpus(out, ev):
    import shutil

    import yaml

    from masg_tpu.cli.gather import main as gather_main
    from masg_tpu.cli.preprocess import main as preprocess_main
    from masg_tpu.data.synthetic import make_synthetic_corpus

    t0 = time.time()
    specs = [("SYNJVS", "ja", "jvs"), ("SYNVCTK", "en", "vctk")]
    pres = {}
    for i, (dataset, lang, prefix) in enumerate(specs):
        _, pre, _ = make_synthetic_corpus(
            out, n_speakers=N_SPK_PER_CORPUS, utts_per_speaker=UTTS_PER_SPK,
            seed=1000 + i, dataset=dataset, languages=(lang,),
            speaker_prefix=prefix, style="vocal", n_phones=(24, 40),
            voice_variation=True)
        pres[dataset] = pre
    t_synth = time.time() - t0
    n_utts = 2 * N_SPK_PER_CORPUS * UTTS_PER_SPK
    print(f"[corpus] synthesized {n_utts} utts ({t_synth:.0f}s)", flush=True)

    # config dir: full reference JVS-VCTK dims (model.yaml), batch 16 group 4
    cfg_dir = os.path.join(out, "config")
    os.makedirs(cfg_dir, exist_ok=True)
    with open(os.path.join(cfg_dir, "preprocess.yaml"), "w") as f:
        yaml.dump({
            "val_size": 0.1, "test_size": 0.1,
            "audio": {"sampling_rate": 22050, "max_wav_value": 32768.0},
            "stft": {"filter_length": 1024, "hop_length": 256,
                     "win_length": 1024},
            "mel": {"n_mel_channels": 80, "mel_fmin": 0, "mel_fmax": 8000},
            "pitch": {"feature": "phoneme_level", "normalization": True},
            "energy": {"feature": "phoneme_level", "normalization": True},
            "speaker_generation": {"metadata": {
                "gender": {"M": 0, "F": 1}, "language": {"ja": 0, "en": 1}}},
        }, f)
    with open(os.path.join(cfg_dir, "model.yaml"), "w") as f:
        yaml.dump({  # reference config/JVS-VCTK/model.yaml dims (~35M)
            "transformer": {
                "encoder_layer": 4, "encoder_head": 2, "encoder_hidden": 256,
                "decoder_layer": 6, "decoder_head": 2, "decoder_hidden": 256,
                "conv_filter_size": 1024, "conv_kernel_size": [9, 1],
                "encoder_dropout": 0.2, "decoder_dropout": 0.2,
            },
            "variance_predictor": {"filter_size": 256, "kernel_size": 3,
                                   "dropout": 0.5},
            "variance_embedding": {"pitch_quantization": "linear",
                                   "energy_quantization": "linear",
                                   "n_bins": 256},
            "jdit": {"use_jdit": False},
            "multi_speaker": True,
            "max_seq_len": 1000,
            "vocoder": {"model": "HiFi-GAN", "speaker": "universal"},
            "speaker_generation": {"GMM_mixtures": 3},
            "discriminator": {"hidden": 64},
        }, f)
    with open(os.path.join(cfg_dir, "train.yaml"), "w") as f:
        yaml.dump({
            "path": {"ckpt_path": os.path.join(out, "out", "ckpt"),
                     "log_path": os.path.join(out, "out", "log"),
                     "result_path": os.path.join(out, "out", "result")},
            "optimizer": {
                "batch_size": 16, "betas": [0.9, 0.98], "eps": 1.0e-9,
                "weight_decay": 0.0, "grad_clip_thresh": 1.0,
                "grad_acc_step": 1, "warm_up_step": 4000,
                # reference [300k,400k,500k] never fires inside 30k steps;
                # scaled to the 30k schedule so the anneal path runs
                "anneal_steps": [12000, 18000, 24000], "anneal_rate": 0.3},
            "step": {"total_step": PRETRAIN_STEPS, "log_step": 200,
                     "synth_step": 10**9, "val_step": 5000,
                     "save_step": 2000, "keep_last": 5},
            "dataparallel": False, "group_size": 4,
        }, f)
    for dataset, lang, _prefix in specs:
        with open(os.path.join(cfg_dir, f"preprocess_{dataset}.yaml"), "w") as f:
            yaml.dump({
                "dataset": dataset,
                "path": {"raw_path": os.path.join(out, "raw_data", dataset),
                         "preprocessed_path": pres[dataset]},
                "text": {"text_cleaners": [], "language": lang},
                "accent": {"use_accent": True},
            }, f)

    t1 = time.time()
    preprocess_main(["--config", cfg_dir])
    t_pre = time.time() - t1
    t2 = time.time()
    gather_main(["--config", cfg_dir])
    t_gather = time.time() - t2

    with open(os.path.join(cfg_dir, "speakers.json")) as f:
        n_speakers = len(json.load(f))
    ev["corpus"] = {
        "n_speakers": n_speakers, "n_utts": n_utts,
        "synth_s": round(t_synth, 1),
        "preprocess_s": round(t_pre, 1),
        "preprocess_utts_per_s": round(n_utts / t_pre, 2),
        "gather_s": round(t_gather, 1),
    }
    print(f"[corpus] {json.dumps(ev['corpus'])}", flush=True)
    return ev


def _run_train(args_list, kill_at_step=None, log_txt=None):
    """Run cli.train as a subprocess; optionally SIGTERM it once log.txt
    crosses kill_at_step. Returns (returncode, resume_step or None)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "masg_tpu.cli.train"] + args_list
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    resume_step = None
    killed = False
    lines = []
    for line in proc.stdout:
        lines.append(line)
        sys.stdout.write(line)
        sys.stdout.flush()
        if "resume with --restore_step" in line:
            resume_step = int(line.rsplit("--restore_step", 1)[1].strip())
        if (kill_at_step is not None and not killed
                and line.startswith("Step ")):
            try:
                step_now = int(line.split("Step ", 1)[1].split("/", 1)[0])
            except ValueError:
                step_now = 0
            if step_now >= kill_at_step:
                print(f"[refscale] SIGTERM at step {step_now} "
                      f"(simulated preemption)", flush=True)
                proc.send_signal(signal.SIGTERM)
                killed = True
    proc.wait()
    return proc.returncode, resume_step, killed


def _scan_scalars(log_dir, tag):
    path = os.path.join(log_dir, "scalars.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == tag:
                rows.append((rec["step"], rec["value"]))
    return rows


def stage_pretrain(out, ev):
    import numpy as np

    cfg_dir = os.path.join(out, "config")
    t0 = time.time()
    rc, resume_step, killed = _run_train(
        ["-c", cfg_dir, "--bf16", "--seed", "0"], kill_at_step=KILL_AT_STEP)
    assert killed and resume_step is not None, (rc, resume_step)
    assert rc == 0, rc
    t_kill = time.time() - t0
    print(f"[refscale] killed+saved at {resume_step} after {t_kill:.0f}s; "
          f"resuming", flush=True)
    rc2, _, _ = _run_train(["-c", cfg_dir, "--bf16", "--seed", "0",
                            "--restore_step", str(resume_step)])
    assert rc2 == 0, rc2
    wall = time.time() - t0

    log_dir = os.path.join(out, "out", "log", "train")
    tot = _scan_scalars(log_dir, "Loss/total_loss")
    lr = _scan_scalars(log_dir, "Training/learning_rate")
    val = _scan_scalars(os.path.join(out, "out", "log", "val"),
                        "Loss/total_loss")
    assert all(np.isfinite(v) for _, v in tot), "NaN/inf in train loss"
    # anneal evidence: lr ratio across each anneal boundary ~0.3
    lr_d = dict(lr)
    anneal_ratios = [round(lr_d[s + 200] / lr_d[s], 4)
                     for s in (12000, 18000, 24000)]
    ckpts = sorted(int(d) for d in os.listdir(
        os.path.join(out, "out", "ckpt")) if d.isdigit())
    ev["pretrain"] = {
        "steps": PRETRAIN_STEPS, "wall_s": round(wall, 1),
        "steps_per_s": round(PRETRAIN_STEPS / wall, 2),
        "killed_resumed_at": resume_step,
        "loss_first": tot[0], "loss_last": tot[-1],
        "loss_min": min(v for _, v in tot),
        "val_losses": val,
        "lr_at_warmup_end": lr_d.get(4000),
        "anneal_ratios_observed": anneal_ratios,
        "ckpts_kept": ckpts, "keep_last": 5,
    }
    _save_evidence(out, ev)
    print(f"[pretrain] {json.dumps(ev['pretrain'])}", flush=True)
    return ev


def stage_clf(out, ev, discriminator_path):
    import shutil

    import numpy as np
    import yaml

    cfg_dir = os.path.join(out, "config")
    clf_dir = os.path.join(out, "config_langemb")
    os.makedirs(clf_dir, exist_ok=True)
    for f in os.listdir(cfg_dir):
        shutil.copy(os.path.join(cfg_dir, f), os.path.join(clf_dir, f))
    with open(os.path.join(clf_dir, "train.yaml")) as f:
        ty = yaml.safe_load(f)
    ty["discriminator_path"] = discriminator_path
    ty["lambda"] = 1.0
    ty["path"] = {"ckpt_path": os.path.join(out, "out_clf", "ckpt"),
                  "log_path": os.path.join(out, "out_clf", "log"),
                  "result_path": os.path.join(out, "out_clf", "result")}
    ty["step"] = dict(ty["step"], total_step=CLF_STEPS, save_step=5000,
                      val_step=10000, keep_last=3)
    # fine-tune keeps the reference's warm_up/anneal config: the restored
    # optimizer count continues, matching the reference's --checkpoint
    # warm-start semantics (model-only; the optimizer restarts)
    with open(os.path.join(clf_dir, "train.yaml"), "w") as f:
        yaml.dump(ty, f)

    t0 = time.time()
    rc, _, _ = _run_train(
        ["-c", clf_dir, "--use_clf", "--bf16", "--seed", "0",
         "--checkpoint",
         os.path.join(out, "out", "ckpt", str(PRETRAIN_STEPS))])
    assert rc == 0, rc
    wall = time.time() - t0

    log_dir = os.path.join(out, "out_clf", "log", "train")
    tot = _scan_scalars(log_dir, "Loss/total_loss")
    dl = _scan_scalars(log_dir, "Loss/language_classification_loss")
    assert all(np.isfinite(v) for _, v in tot), "NaN/inf in clf train loss"
    ev["clf"] = {
        "steps": CLF_STEPS, "wall_s": round(wall, 1),
        "steps_per_s": round(CLF_STEPS / wall, 2),
        "loss_first": tot[0], "loss_last": tot[-1],
        "dloss_first": dl[0] if dl else None,
        "dloss_last": dl[-1] if dl else None,
    }
    _save_evidence(out, ev)
    print(f"[clf] {json.dumps(ev['clf'])}", flush=True)
    return ev


def stage_mcd(out, ev):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "mcd_north_star.py"),
         "--out", os.path.join(out, "mcd"),
         "--config", os.path.join(out, "config"),
         "--step", str(PRETRAIN_STEPS)], env=env)
    assert rc == 0, rc
    with open(os.path.join(out, "mcd", "mcd_north_star.json")) as f:
        ev["mcd_30k"] = json.load(f)
    _save_evidence(out, ev)
    print(f"[mcd] {json.dumps(ev['mcd_30k'])}", flush=True)
    return ev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--stage", default="all",
                    choices=["corpus", "pretrain", "clf", "mcd", "all"])
    ap.add_argument("--discriminator_path", default="/tmp/full_pipe/spk_enc",
                    help="separately-pretrained GE2E ckpt dir (reference "
                         "train.yaml:6 discriminator_path semantics)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    ev = _load_evidence(args.out)
    stages = ([args.stage] if args.stage != "all"
              else ["corpus", "pretrain", "clf", "mcd"])
    for st in stages:
        if st == "corpus":
            ev = stage_corpus(args.out, ev)
        elif st == "pretrain":
            ev = stage_pretrain(args.out, ev)
        elif st == "clf":
            ev = stage_clf(args.out, ev, args.discriminator_path)
        elif st == "mcd":
            ev = stage_mcd(args.out, ev)
        _save_evidence(args.out, ev)
    print("refscale done:", json.dumps(ev, indent=1))


if __name__ == "__main__":
    main()
