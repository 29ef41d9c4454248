"""Time one dryrun_multichip variant in isolation (cold-cache calibration).

Usage: MASG_NO_COMPILE_CACHE=1 python scripts/time_dryrun_variant.py <variant> [n_devices]
Variants: plain use_clf ganlike jdit vocoder_gan
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1]
n_devices = int(sys.argv[2]) if len(sys.argv) > 2 else 8

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_devices}"
).strip()
os.environ.setdefault("MASG_NO_COMPILE_CACHE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import re
import tempfile

import numpy as np

t0 = time.time()

if variant == "vocoder_gan":
    import __graft_entry__ as ge

    ge._dryrun_vocoder_dp(n_devices)
    print(f"TIMING {variant}: {time.time() - t0:.1f}s")
    sys.exit(0)

from masg_tpu.core.config import load_config_dir
from masg_tpu.data.synthetic import build_synthetic_experiment_dir
from masg_tpu.train.loop import build_experiment

n_model = 2
bs = max(n_devices // n_model, 1) * 2

with tempfile.TemporaryDirectory() as tmp:
    cfg_dir = build_synthetic_experiment_dir(
        tmp, n_speakers=2, utts_per_speaker=max(6, bs),
        batch_size=bs, group_size=1, total_step=8, log_step=1,
        synth_step=10**9, val_step=10**9, save_step=10**9, grad_acc_step=2,
    )
    cfg = load_config_dir(cfg_dir)
    log_txt = os.path.join(cfg.train.path.log_path, "train", "log.txt")
    t1 = time.time()
    print(f"TIMING {variant}: corpus+preprocess {t1 - t0:.1f}s")

    kwargs = {}
    if variant == "use_clf":
        kwargs["use_clf"] = True
    elif variant == "ganlike":
        kwargs["ganlike"] = True
    cfg.model.jdit.use_jdit = variant == "jdit"
    # mirror dryrun_multichip: plain proves MultiSteps (grad_acc 2, 2 fit
    # steps = 1 update); other variants run one grad_acc-1 update
    grad_acc = 2 if variant == "plain" else 1
    cfg.train.optimizer.grad_acc_step = grad_acc
    trainer = build_experiment(cfg, n_model=n_model, seed=0, **kwargs)
    t2 = time.time()
    print(f"TIMING {variant}: build_experiment {t2 - t1:.1f}s")
    trainer.fit(max_steps=2 if grad_acc == 2 else 1, verbose=False)
    t3 = time.time()
    losses = re.findall(r"Total Loss: ([\d.eE+-]+)", open(log_txt).read())
    assert np.isfinite(float(losses[-1]))
    print(f"TIMING {variant}: fit {t3 - t2:.1f}s  TOTAL {t3 - t0:.1f}s")
