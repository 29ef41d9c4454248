#!/usr/bin/env bash
# Lambda-sweep fine-tuning recipe (reference train.sh:12-19): warm-start each
# langemb run from the 20000-step JVS-VCTK pretrain and train with the
# adversarial language discriminator at several lambda weights.
set -euo pipefail

PRETRAIN_CKPT=${PRETRAIN_CKPT:-./output/ckpt/JVS-VCTK_pretrain}
DISCRIMINATOR=${DISCRIMINATOR:-./output_sg/ge2e_ckpt}
CONFIG_ROOT=${CONFIG_ROOT:-./config}

for lambda in 0.3 1 3 10; do
  cfg="$CONFIG_ROOT/JVS-VCTK_langemb_$lambda"
  python -m masg_tpu.cli.make_config JVS-VCTK-langemb -o "$cfg" \
    --lambda "$lambda" --discriminator_path "$DISCRIMINATOR"
  python -m masg_tpu.cli.train -c "$cfg" --use_clf \
    --checkpoint "$PRETRAIN_CKPT" --corpus JVS VCTK
done
