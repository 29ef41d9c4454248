"""Golden parity for HTS alignment prep (VERDICT r1 item 6).

tests/data/konnichiwa_full.lab is a committed OpenJTalk-style full-context
label file for "konnichiwa" (5 moras, accent type 4 -> nucleus on "chi").
Expected phones / frame durations / accent marks below were derived by hand
from the reference's rules:

- convert_label.py:52-76 (openjtalk2julius, -p+ extraction, /10e6 times)
- prepare_tg_accent_jsut.py:18-66 (pp_symbols accent decision table)
- preprocessor/preprocessor.py:267-305 (get_alignment silence trim + frame
  rounding at sr=22050 hop=256)

The mora-merge golden exercises convert_label.py:25-48 can_follow rules, and
the seconds/escapes variants cover convert_label_jvs.py:75 and
prepare_tg_hts.py:58-74.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
LAB = os.path.join(DATA, "konnichiwa_full.lab")

EXPECTED_PHONES = ["k", "o", "N", "n", "i", "ch", "i", "w", "a"]
# round(e*sr/hop) - round(s*sr/hop) per interval, silences trimmed
EXPECTED_DURATIONS = [7, 10, 11, 7, 10, 11, 10, 7, 13]
EXPECTED_ACCENT = "0[0000]00"  # rise after mora 1, nucleus fall on mora 4
EXPECTED_MORAS = ["sil", "ko", "N", "ni", "chi", "wa", "sil"]


def test_full_context_lab_to_segments():
    from masg_tpu.preprocessor.alignments import read_full_context_lab

    segs = read_full_context_lab(LAB)
    assert [s.label for s in segs] == ["sil"] + EXPECTED_PHONES + ["sil"]
    assert segs[0].t_start == 0.0 and abs(segs[0].t_end - 0.25) < 1e-9
    assert abs(segs[-1].t_end - 1.5) < 1e-9


def test_mora_merge_golden():
    from masg_tpu.preprocessor.alignments import by_moras, read_full_context_lab

    moras = by_moras(read_full_context_lab(LAB))
    assert [m.label for m in moras] == EXPECTED_MORAS
    # mora spans cover the phone spans exactly
    assert abs(moras[1].t_start - 0.25) < 1e-9 and abs(moras[1].t_end - 0.45) < 1e-9


def test_prepare_alignments_cli_golden(tmp_path):
    """Full pipeline: .lab -> TextGrid + accent -> get_alignment durations,
    byte-identical to the hand-derived reference outputs."""
    import shutil

    from masg_tpu.cli.prepare_alignments import main as prep_main
    from masg_tpu.preprocessor.preprocessor import Preprocessor
    from masg_tpu.preprocessor.textgrid import read_textgrid

    lab_dir = tmp_path / "labs"
    lab_dir.mkdir()
    shutil.copy(LAB, lab_dir / "konnichiwa_full.lab")
    out = str(tmp_path / "out")
    prep_main([str(lab_dir), out, "spk01", "--with_accent"])

    accent = open(os.path.join(out, "accent", "konnichiwa_full.accent")).read()
    assert accent == EXPECTED_ACCENT

    tg = read_textgrid(os.path.join(out, "TextGrid", "spk01",
                                    "konnichiwa_full.TextGrid"))
    tier = tg.get_tier_by_name("phones")

    cfg = {
        "dataset": "X",
        "path": {"raw_path": str(tmp_path), "preprocessed_path": out},
        "preprocessing": {
            "val_size": 0.2, "test_size": 0.2,
            "audio": {"sampling_rate": 22050, "max_wav_value": 32768.0},
            "stft": {"filter_length": 1024, "hop_length": 256, "win_length": 1024},
            "mel": {"n_mel_channels": 80, "mel_fmin": 0, "mel_fmax": 8000},
            "pitch": {"feature": "phoneme_level", "normalization": True},
            "energy": {"feature": "phoneme_level", "normalization": True},
            "speaker_generation": {"metadata": {"gender": {"M": 0, "F": 1}}},
        },
        "text": {"text_cleaners": [], "language": "ja"},
        "accent": {"use_accent": True},
    }
    pre = Preprocessor(cfg)
    phones, durations, start, end = pre.get_alignment(tier)
    assert phones == EXPECTED_PHONES
    assert durations == EXPECTED_DURATIONS
    assert abs(start - 0.25) < 1e-9 and abs(end - 1.25) < 1e-9


def test_jvs_seconds_variant(tmp_path):
    """convert_label_jvs.py:75: identical labels, times already in seconds."""
    from masg_tpu.preprocessor.alignments import read_full_context_lab

    lines = []
    for line in open(LAB):
        a, b, rest = line.split(maxsplit=2)
        lines.append(f"{float(a) / 1e7} {float(b) / 1e7} {rest}")
    sec_lab = tmp_path / "konnichiwa_sec.lab"
    sec_lab.write_text("".join(lines))

    ref = read_full_context_lab(LAB)
    got = read_full_context_lab(str(sec_lab), times_in_seconds=True)
    assert [s.label for s in got] == [s.label for s in ref]
    np.testing.assert_allclose([s.t_start for s in got], [s.t_start for s in ref],
                               atol=1e-9)


def test_plain_lab_octal_escapes(tmp_path):
    """prepare_tg_hts.py:58-74: Julius mora labels arrive as \\ooo octal
    UTF-8 byte escapes; 'cl'->'q', 'pau'->'sp', vowel upper->lower."""
    from masg_tpu.preprocessor.alignments import decode_octal_escapes, read_plain_lab

    assert decode_octal_escapes(r"\343\201\202") == "あ"  # hiragana A
    assert decode_octal_escapes("ka") == "ka"

    lab = tmp_path / "x.lab"
    lab.write_text("0.0 0.1 silB\n0.1 0.2 k\n0.2 0.3 \\343\\201\\202\n"
                   "0.3 0.4 cl\n0.4 0.5 pau\n0.5 0.6 A\n0.6 0.7 silE\n")
    segs = read_plain_lab(str(lab))
    assert [s.label for s in segs] == ["silB", "k", "あ", "q", "sp", "a", "silE"]
