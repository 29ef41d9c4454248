"""Runtime G2P adapters (host-side text processing).

Reference: synthesize.py:35-101, prepare_tg_accent_jsut.py:18-66 (pp_symbols),
convert_label.py:52-59 (openjtalk2julius). The native G2P engines —
pyopenjtalk (C++ OpenJTalk) for Japanese, the espeak-ng binary for English —
are invoked when present and raise a clear error otherwise (this image ships
neither); callers can always pass phone strings directly, which is also the
reference's main training path.
"""

from __future__ import annotations

import re
import shutil
import subprocess
from string import punctuation
from typing import List, Tuple


def openjtalk2julius(p3: str) -> str:
    """OpenJTalk phone names -> Julius phone set (convert_label.py:52-59)."""
    if p3 in ("A", "I", "U", "E", "O"):
        return p3.lower()
    if p3 == "cl":
        return "q"
    if p3 == "pau":
        return "sp"
    return p3


def _numeric_feature_by_regex(regex: str, s: str) -> int:
    match = re.search(regex, s)
    if match is None:
        return -50
    return int(match.group(1))


def pp_symbols(labels: List[str], drop_unvoiced_vowels: bool = True
               ) -> Tuple[List[str], List[str]]:
    """Full-context labels -> (phones, accent marks '0'/'['/']'/'#')
    (prepare_tg_accent_jsut.py:18-66)."""
    pp: List[str] = []
    accent: List[str] = []
    n_labels = len(labels)
    for n, lab_curr in enumerate(labels):
        p3 = re.search(r"\-(.*?)\+", lab_curr).group(1)
        if drop_unvoiced_vowels and p3 in "AEIOU":
            p3 = p3.lower()
        if p3 == "sil":
            assert n == 0 or n == n_labels - 1
            continue
        elif p3 == "pau":
            pp.append("sp")
            accent.append("0")
            continue
        else:
            pp.append(p3)
        a1 = _numeric_feature_by_regex(r"/A:([0-9\-]+)\+", lab_curr)
        a2 = _numeric_feature_by_regex(r"\+(\d+)\+", lab_curr)
        a3 = _numeric_feature_by_regex(r"\+(\d+)/", lab_curr)
        f1 = _numeric_feature_by_regex(r"/F:(\d+)_", lab_curr)
        lab_next = labels[n + 1]
        a2_next = _numeric_feature_by_regex(r"\+(\d+)\+", lab_next)
        if a3 == 1 and a2_next == 1:
            accent.append("#")  # accent-phrase boundary
        elif a1 == 0 and a2_next == a2 + 1 and a2 != f1:
            accent.append("]")  # pitch fall (accent nucleus)
        elif a2 == 1 and a2_next == 2:
            accent.append("[")  # pitch rise
        else:
            accent.append("0")
    return pp, accent


def preprocess_japanese(text: str) -> Tuple[List[str], List[str]]:
    """Japanese text -> (phones, accents) via pyopenjtalk full-context labels
    (synthesize.py:96-101)."""
    try:
        import pyopenjtalk
    except ImportError as e:
        raise RuntimeError(
            "Japanese G2P needs pyopenjtalk (OpenJTalk C++ binding), which is "
            "not installed in this environment. Pass phones directly with "
            "--phones '{k o N n i ch i w a}' --accents '00000...' instead."
        ) from e
    labels = pyopenjtalk.extract_fullcontext(text)
    phonemes, accents = pp_symbols(labels)
    phonemes = [openjtalk2julius(p) for p in phonemes if p != ""]
    return phonemes, accents


def preprocess_english(text: str) -> List[str]:
    """English text -> IPA phones via the espeak-ng binary
    (synthesize.py:35-66; identical subprocess contract)."""
    if shutil.which("espeak-ng") is None:
        raise RuntimeError(
            "English G2P needs the espeak-ng binary, which is not installed. "
            "Pass phones directly with --phones instead."
        )
    text = text.rstrip(punctuation)
    cmd = ["espeak-ng", "--ipa", "--sep", "-v", "en", "-q", '"{}"'.format(text)]
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    res2: List[str] = []
    for line in iter(p.stdout.readline, b""):
        res2.extend(
            re.split(" +", line.decode("utf8").strip().replace("ˌ", "").replace("ˈ", ""))
        )
        res2.append("pau")
    p.stdout.close()
    res2 = [r for r in res2[:-1] if r != "_:"]
    return [openjtalk2julius(r) for r in res2]


DEFAULT_LEXICON = "lexicon/pinyin-lexicon-r.txt"


def resolve_lexicon_path(path=None, config_dir=None) -> str:
    """Locate the pinyin lexicon: explicit path, else <config_dir>/lexicon/...,
    else cwd-relative (the reference hardcodes only the cwd-relative form,
    synthesize.py:88, which breaks when run from elsewhere)."""
    import os

    candidates = [path] if path else []
    if config_dir:
        candidates.append(os.path.join(config_dir, DEFAULT_LEXICON))
    candidates.append(DEFAULT_LEXICON)
    for c in candidates:
        if c and os.path.exists(c):
            return c
    raise ValueError(
        f"pinyin lexicon not found (tried {candidates}); pass --lexicon")


def read_lexicon(lex_path: str) -> dict:
    """Pinyin lexicon reader (synthesize.py:24-32)."""
    lexicon = {}
    with open(lex_path) as f:
        for line in f:
            temp = re.split(r"\s+", line.strip("\n"))
            word = temp[0]
            phones = temp[1:]
            if word.lower() not in lexicon:
                lexicon[word.lower()] = phones
    return lexicon


def preprocess_mandarin(text: str, lexicon_path: str) -> List[str]:
    """Mandarin text -> pinyin phones via pypinyin + lexicon
    (synthesize.py:69-94; vestigial upstream path, kept for parity)."""
    try:
        from pypinyin import Style, pinyin
    except ImportError as e:
        raise RuntimeError("Mandarin G2P needs pypinyin (not installed).") from e
    lexicon = read_lexicon(lexicon_path)
    phones: List[str] = []
    pinyins = [
        p[0]
        for p in pinyin(text, style=Style.TONE3, strict=False, neutral_tone_with_five=True)
    ]
    for p in pinyins:
        if p in lexicon:
            phones += lexicon[p]
        else:
            phones.append("sp")
    return phones
