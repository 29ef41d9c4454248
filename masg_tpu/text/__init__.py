"""Text / phoneme frontend.

Converts phone lists to integer id sequences against the shared multilingual
symbol inventory. Mirrors the reference's `text_to_sequence`
(text/__init__.py:15-33,58-65): bare silence phones ('sil','sp','spn') are
mapped through their '@'-prefixed silence entries; everything else is a direct
table lookup. Note the table is built with a last-wins dict comprehension, so
duplicated symbols (e.g. 'sp' appears in silences, Japanese and IPA lists)
resolve to their final occurrence — identical to the reference's behaviour.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

from .symbols import N_SRC_VOCAB, PAD, symbols, symbol_to_id, id_to_symbol

# accent marks -> ids; id 4 = "no accent info" constant used by non-accent
# corpora (reference dataset.py:23,53)
ACCENT_TO_ID = {"0": 0, "[": 1, "]": 2, "#": 3}
NO_ACCENT_ID = 4
N_ACCENT = 5


def text_to_sequence(phones: Iterable[str]) -> List[int]:
    """Phone list -> symbol-id list (reference text/__init__.py:15-33)."""
    seq = []
    for s in phones:
        if s in ("sil", "sp", "spn"):
            seq.append(symbol_to_id["@" + s])
        else:
            seq.append(symbol_to_id[s])
    return seq


def pinyin_to_sequence(phones: Iterable[str]) -> List[int]:
    """Pinyin phone list -> ids via the '@'-prefixed table entries.

    Pinyin (like ARPAbet) symbols are stored '@'-prefixed to stay distinct
    from bare letters (symbols.py:74-75), so a tone-bearing phone like 'i3'
    only exists as '@i3'. This reproduces the upstream-FastSpeech2 braces
    semantics (`_arpabet_to_sequence`, reference text/__init__.py:68-69);
    the reference's own mandarin CLI path is unrunnable — synthesize.py:89
    calls text_to_sequence(phones, cleaners) against the one-arg signature
    (text/__init__.py:15), a vestigial TypeError — so the working upstream
    semantics is implemented instead.
    """
    return [symbol_to_id["@" + p] for p in phones]


def phone_string_to_sequence(text: str) -> List[int]:
    """'{a b c}'-style metadata phone string -> ids.

    Matches the dataset path (reference dataset.py:46): direct table lookup on
    the braces-stripped, space-split string (silences NOT '@'-remapped here —
    the metadata files already store the final symbols).
    """
    return [symbol_to_id[t] for t in text.replace("{", "").replace("}", "").split()]


def sequence_to_text(sequence: Sequence[int]) -> str:
    """Ids back to a string, ARPAbet re-braced (reference text/__init__.py:36-46)."""
    result = ""
    for sid in sequence:
        if sid in id_to_symbol:
            s = id_to_symbol[sid]
            if len(s) > 1 and s[0] == "@":
                s = "{%s}" % s[1:]
            result += s
    return result.replace("}{", " ")


def accents_to_ids(accent_str: str, n_phones: int) -> List[int]:
    """Accent-file characters -> ids, truncated to the phone count
    (reference dataset.py:47-53)."""
    ids = [ACCENT_TO_ID[c] for c in accent_str]
    return ids[:n_phones]


__all__ = [
    "symbols",
    "symbol_to_id",
    "id_to_symbol",
    "N_SRC_VOCAB",
    "PAD",
    "ACCENT_TO_ID",
    "NO_ACCENT_ID",
    "N_ACCENT",
    "text_to_sequence",
    "phone_string_to_sequence",
    "sequence_to_text",
    "accents_to_ids",
]
