"""Text cleaner tests (keithito pipeline semantics)."""

import pytest

from masg_tpu.text.cleaners import (
    basic_cleaners,
    clean_text,
    english_cleaners,
    normalize_numbers,
)

pytestmark = pytest.mark.smoke


def test_numbers():
    assert normalize_numbers("I have 2 cats") == "I have two cats"
    assert normalize_numbers("1,234 items") == "one thousand two hundred thirty four items"
    assert normalize_numbers("$5.50 please") == "five dollars, fifty cents please"
    assert normalize_numbers("3.14 pie") == "three point one four pie"
    assert normalize_numbers("the 3rd time") == "the third time"
    assert normalize_numbers("the 22nd") == "the twenty second"
    assert normalize_numbers("0 items") == "zero items"


def test_english_cleaners():
    assert english_cleaners("Dr. Smith   has 3 DOGS.") == "doctor smith has three dogs."
    assert english_cleaners("Mr. Jones paid $20") == "mister jones paid twenty dollars"


def test_basic_and_dispatch():
    assert basic_cleaners("  Hello   WORLD ") == " hello world "
    assert clean_text("IT IS 5 PM", ["english_cleaners"]) == "it is five pm"
