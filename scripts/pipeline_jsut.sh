#!/usr/bin/env bash
# Minimum end-to-end recipe (SURVEY §7): JSUT single-speaker FastSpeech2 from
# raw corpus to synthesized wav. Mirrors the reference's preprocess -> train
# -> synthesize flow.
set -euo pipefail

CONFIG=${CONFIG:-./config/JSUT}
DATA_ROOT=${DATA_ROOT:-/path/to/corpora}

python -m masg_tpu.cli.make_config JSUT -o "$CONFIG" --data_root "$DATA_ROOT"
python -m masg_tpu.cli.retrieve --config "$CONFIG" --corpus jsut
python -m masg_tpu.cli.prepare_alignments \
  "$DATA_ROOT/jsut-lab" ./preprocessed_data/JSUT JSUT --with_accent
python -m masg_tpu.cli.preprocess --config "$CONFIG"
python -m masg_tpu.cli.train -c "$CONFIG"
python -m masg_tpu.cli.synthesize -c "$CONFIG" -r 90000 -l ja --use_accent \
  -t "こんにちは"
