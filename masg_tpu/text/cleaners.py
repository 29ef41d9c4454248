"""Text cleaners (reference text/cleaners.py + numbers.py, from the public
keithito/tacotron pipeline).

The main training path feeds phone lists, not sentences (SURVEY §2.4), but
config files name cleaners ('english_cleaners') and TextDataset passes them
through, so the same cleaner set is provided. Transliteration
(transliteration_cleaners' unidecode step) is gated on the optional
`unidecode` package.
"""

from __future__ import annotations

import re

_whitespace_re = re.compile(r"\s+")

_ABBREVIATIONS = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
        ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
        ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
        ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]

_ONES = ["", "one", "two", "three", "four", "five", "six", "seven", "eight",
         "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
         "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALES = [(10 ** 9, "billion"), (10 ** 6, "million"), (10 ** 3, "thousand"),
           (10 ** 2, "hundred")]


def _number_to_words(n: int) -> str:
    if n == 0:
        return "zero"
    parts = []
    for scale, name in _SCALES:
        if n >= scale:
            parts.append(_number_to_words(n // scale))
            parts.append(name)
            n %= scale
    if n >= 20:
        parts.append(_TENS[n // 10])
        if n % 10:
            parts.append(_ONES[n % 10])
    elif n > 0:
        parts.append(_ONES[n])
    return " ".join(parts)


_comma_number_re = re.compile(r"([0-9][0-9\,]+[0-9])")
_decimal_re = re.compile(r"([0-9]+\.[0-9]+)")
_dollars_re = re.compile(r"\$([0-9\.\,]*[0-9]+)")
_pounds_re = re.compile(r"£([0-9\,]*[0-9]+)")
_ordinal_re = re.compile(r"([0-9]+)(st|nd|rd|th)")
_number_re = re.compile(r"[0-9]+")

_ORDINAL_SPECIAL = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def _expand_ordinal(m):
    words = _number_to_words(int(m.group(1)))
    head, _, last = words.rpartition(" ")
    if last in _ORDINAL_SPECIAL:
        last = _ORDINAL_SPECIAL[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return (head + " " + last).strip()


def _expand_dollars(m):
    parts = m.group(1).replace(",", "").split(".")
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1][:2]) if len(parts) > 1 and parts[1] else 0
    out = []
    if dollars:
        out.append(f"{_number_to_words(dollars)} dollar{'s' if dollars != 1 else ''}")
    if cents:
        out.append(f"{_number_to_words(cents)} cent{'s' if cents != 1 else ''}")
    return ", ".join(out) if out else "zero dollars"


def normalize_numbers(text: str) -> str:
    text = _comma_number_re.sub(lambda m: m.group(1).replace(",", ""), text)
    text = _pounds_re.sub(lambda m: _number_to_words(int(m.group(1).replace(",", ""))) + " pounds", text)
    text = _dollars_re.sub(_expand_dollars, text)

    def expand_decimal(m):
        int_part, frac = m.group(1).split(".")
        digits = " ".join(_ONES[int(d)] if d != "0" else "zero" for d in frac)
        return f"{_number_to_words(int(int_part))} point {digits}"

    text = _decimal_re.sub(expand_decimal, text)
    text = _ordinal_re.sub(_expand_ordinal, text)
    text = _number_re.sub(lambda m: _number_to_words(int(m.group(0))), text)
    return text


def expand_abbreviations(text: str) -> str:
    for pattern, replacement in _ABBREVIATIONS:
        text = pattern.sub(replacement, text)
    return text


def lowercase(text: str) -> str:
    return text.lower()


def collapse_whitespace(text: str) -> str:
    return _whitespace_re.sub(" ", text)


def convert_to_ascii(text: str) -> str:
    try:
        from unidecode import unidecode

        return unidecode(text)
    except ImportError:
        return text.encode("ascii", "ignore").decode("ascii")


def basic_cleaners(text: str) -> str:
    """Lowercase + collapse whitespace (no transliteration)."""
    return collapse_whitespace(lowercase(text))


def transliteration_cleaners(text: str) -> str:
    """ASCII transliteration + basic."""
    return collapse_whitespace(lowercase(convert_to_ascii(text)))


def english_cleaners(text: str) -> str:
    """Full English pipeline: ascii, lowercase, numbers, abbreviations."""
    text = convert_to_ascii(text)
    text = lowercase(text)
    text = normalize_numbers(text)
    text = expand_abbreviations(text)
    return collapse_whitespace(text)


def clean_text(text: str, cleaner_names) -> str:
    """Apply named cleaners in order (reference text/__init__.py:49-55)."""
    for name in cleaner_names:
        fn = globals().get(name)
        if fn is None:
            raise ValueError(f"Unknown cleaner: {name}")
        text = fn(text)
    return text
