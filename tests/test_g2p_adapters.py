"""Execution evidence for the runtime G2P adapters (VERDICT r1 coverage items
39/40: the espeak-ng binary and pypinyin/pyopenjtalk packages are absent from
this image, so the adapters were previously untested code paths).

Strategy: drive each adapter end-to-end through its real integration seam —
a fake `espeak-ng` executable on PATH emitting captured-format IPA output
(reference synthesize.py:35-66 contract), and stub `pypinyin`/`pyopenjtalk`
modules in sys.modules (reference synthesize.py:69-101). The parsing,
stress-mark stripping, `_:` filtering, pau insertion, lexicon lookup, and
pp_symbols plumbing are all first-party code that runs for real here, and the
outputs are checked to be consumable by text_to_sequence.
"""

import os
import stat
import sys
import types

import pytest

pytestmark = pytest.mark.smoke

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _fake_espeak(tmp_path, monkeypatch, body: str):
    exe = tmp_path / "espeak-ng"
    exe.write_text("#!/bin/sh\n" + body)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")


def test_english_single_line(tmp_path, monkeypatch):
    """'hello world' in espeak --ipa --sep format: stress marks stripped,
    `_:` word-pause tokens dropped, trailing per-line pau removed."""
    from masg_tpu.text import text_to_sequence
    from masg_tpu.text.g2p import preprocess_english

    _fake_espeak(
        tmp_path, monkeypatch,
        "printf 'h ə l ˈəʊ _: w ˈɜː l d\\n'\n",
    )
    phones = preprocess_english("hello world.")
    assert phones == ["h", "ə", "l", "əʊ",
                      "w", "ɜː", "l", "d"]
    # every emitted phone is in the shared symbol inventory
    ids = text_to_sequence(phones)
    assert len(ids) == len(phones) and all(i > 0 for i in ids)


def test_english_multiline_pau(tmp_path, monkeypatch):
    """A clause break (second output line) inserts 'pau' -> julius 'sp';
    the final line's trailing pau is dropped (reference res2[:-1])."""
    from masg_tpu.text import text_to_sequence
    from masg_tpu.text.g2p import preprocess_english

    _fake_espeak(
        tmp_path, monkeypatch,
        "printf 'h aɪ\\nb əʊ b\\n'\n",
    )
    phones = preprocess_english("hi, bob")
    assert phones == ["h", "aɪ", "sp", "b", "əʊ", "b"]
    assert len(text_to_sequence(phones)) == 6


def test_english_missing_binary_message(tmp_path, monkeypatch):
    import pytest

    from masg_tpu.text.g2p import preprocess_english

    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    with pytest.raises(RuntimeError, match="espeak-ng"):
        preprocess_english("hello")


def test_mandarin_stub_pypinyin(tmp_path, monkeypatch):
    """Lexicon hit -> phone expansion, miss -> 'sp'
    (reference synthesize.py:69-94)."""
    from masg_tpu.text import pinyin_to_sequence
    from masg_tpu.text.g2p import preprocess_mandarin

    calls = {}

    def pinyin(text, style=None, strict=None, neutral_tone_with_five=None):
        calls["kwargs"] = (style, strict, neutral_tone_with_five)
        return [["ni3"], ["hao3"], ["zzz9"]]

    stub = types.ModuleType("pypinyin")
    stub.pinyin = pinyin
    stub.Style = types.SimpleNamespace(TONE3="TONE3")
    monkeypatch.setitem(sys.modules, "pypinyin", stub)

    lex = tmp_path / "pinyin-lexicon-r.txt"
    lex.write_text("ni3 n i3\nhao3 h ao3\n")
    phones = preprocess_mandarin("你好吗", str(lex))
    assert phones == ["n", "i3", "h", "ao3", "sp"]
    # reference call contract: TONE3, strict=False, neutral_tone_with_five=True
    assert calls["kwargs"] == ("TONE3", False, True)
    # pinyin ids resolve through the '@'-prefixed table entries
    # (reference's own mandarin path is a vestigial TypeError; see
    # masg_tpu/text/__init__.py:pinyin_to_sequence)
    ids = pinyin_to_sequence(phones)
    assert len(ids) == 5 and all(i > 0 for i in ids)


def test_japanese_stub_pyopenjtalk(monkeypatch):
    """Full preprocess_japanese path over the committed konnichiwa
    full-context labels; phones/accents match the hand-derived golden
    (tests/test_alignments_golden.py)."""
    from masg_tpu.text import text_to_sequence
    from masg_tpu.text.g2p import preprocess_japanese

    with open(os.path.join(DATA, "konnichiwa_full.lab")) as f:
        # pyopenjtalk.extract_fullcontext returns labels without times
        labels = [line.split(" ", 2)[2].strip() for line in f if line.strip()]

    stub = types.ModuleType("pyopenjtalk")
    stub.extract_fullcontext = lambda text: labels
    monkeypatch.setitem(sys.modules, "pyopenjtalk", stub)

    phones, accents = preprocess_japanese("こんにちは")
    assert phones == ["k", "o", "N", "n", "i", "ch", "i", "w", "a"]
    assert "".join(accents) == "0[0000]00"
    assert len(text_to_sequence(phones)) == len(phones)
