"""Text front-end tests: normalization, G2P, vocab round-trip, batch masks
(SURVEY §4a: pure-function unit tests)."""
import json

import numpy as np
import pytest

from mamba_tts_tpu.text.g2p import EnG2p, rule_g2p, word_tokenize
from mamba_tts_tpu.text.normalize import normalize_numbers, number_to_words, preprocess_text
from mamba_tts_tpu.text.phonemes import SPECIAL_TOKENS, default_vocab
from mamba_tts_tpu.text.processor import (
    PhonemeFrontend,
    TextProcessor,
    TxtProcessor,
    is_sil_phoneme,
)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == (
        "one million two hundred thirty four thousand five hundred sixty seven"
    )


def test_normalize_numbers():
    assert normalize_numbers("I have 2 cats") == "I have two cats"
    assert "three dollars" in normalize_numbers("$3")
    assert "fifty cents" in normalize_numbers("$0.50")
    assert normalize_numbers("the 3rd time") == "the third time"
    assert "nineteen eighty four" in normalize_numbers("in 1984")
    assert "point one four" in normalize_numbers("3.14")


def test_preprocess_text_chain():
    # lowercase, accent strip, quote removal, hyphen->space, charset filter,
    # punctuation spacing (reference: text_processor.py:121-170)
    out = preprocess_text('Hello, "World"! Café-style (test); ok?')
    assert out == "hello , world ! cafe style test ; ok ? "
    assert preprocess_text("i.e. thus").startswith("that is")


def test_preprocess_times_percent_decades_currency():
    # clock times (the reference leaves the colon as a pause)
    assert preprocess_text("At 5:30 we eat.") == "at five thirty we eat . "
    assert preprocess_text("At 5:00 sharp.") == "at five oclock sharp . "
    assert preprocess_text("At 5:05 maybe.") == "at five oh five maybe . "
    # percent (the reference's charset filter silently drops '%')
    assert preprocess_text("About 50% done.") == "about fifty percent done . "
    assert (
        preprocess_text("It is 3.5% now.")
        == "it is three point five percent now . "
    )
    # decades
    assert preprocess_text("The 1960s!") == "the nineteen sixties ! "
    assert preprocess_text("the 90s") == "the nineties"
    assert preprocess_text("the 1900s") == "the nineteen hundreds"
    # non-dollar currencies
    assert preprocess_text("£20 or €30.") == "twenty pounds or thirty euros . "
    assert (
        preprocess_text("It costs £12.50.")
        == "it costs twelve pounds fifty pence . "
    )
    assert preprocess_text("€1 only.") == "one euro only . "


def test_preprocess_abbreviations_and_slashes():
    # Deliberate quality deviations from the reference chain: spoken title
    # abbreviations, and '/' separating its operands instead of mushing them.
    assert preprocess_text("Dr. Smith met Mr. Jones").startswith(
        "doctor smith met mister jones"
    )
    assert preprocess_text("Mrs. Lee vs. Ms. Kim") == "missus lee versus miss kim"
    out = preprocess_text("on 3/14/2026")
    assert out == "on three fourteen twenty twenty six"
    # words that merely start with an abbreviation are untouched
    assert preprocess_text("drill msgs").strip() == "drill msgs"


def test_is_sil_phoneme():
    assert is_sil_phoneme("")
    assert is_sil_phoneme("|")
    assert is_sil_phoneme(",")
    assert not is_sil_phoneme("AH0")


def test_vocab_matches_shipped_json():
    with open("phoneme_vocab.json") as f:
        shipped = json.load(f)
    assert shipped == default_vocab()
    assert len(shipped) == 79
    assert shipped[:10] == SPECIAL_TOKENS


def test_g2p_lexicon_and_fallback_produce_vocab_tokens():
    vocab = set(default_vocab())
    g2p = EnG2p()
    for text in [
        "the quick brown fox jumps over the lazy dog",
        "speak in a fast and energetic voice",
        "zxqv blorptastic frumious",  # pure OOV -> rule fallback
    ]:
        phones = [p for p in g2p(text) if p != " "]
        for p in phones:
            assert p in vocab, f"{p!r} not in vocab (from {text!r})"


def test_rule_g2p_magic_e_and_digraphs():
    assert rule_g2p("make")[-2][:2] == "EY"  # magic-e long a
    assert "CH" in rule_g2p("chat")
    assert "SH" in rule_g2p("shin")
    assert "TH" in rule_g2p("thin")
    assert rule_g2p("phone")[0] == "F"


def test_word_tokenize():
    assert word_tokenize("hello, world!") == ["hello", ",", "world", "!"]


def test_txt_to_ph_structure():
    tp = TxtProcessor()
    ph, txt, word, ph2word, gb = tp.txt_to_ph("The cat sat.")
    phones = ph.split()
    assert phones[0] == "<BOS>" and phones[-1] == "<EOS>"
    assert "|" in phones  # word boundaries
    assert len(ph2word) == len(phones)
    assert ph2word == sorted(ph2word)  # monotone word mapping
    assert min(ph2word) == 1  # 1-based (0 reserved for padding)
    # trailing punctuation (silence) trimmed before <EOS>
    assert phones[-2] != "."


def test_text_processor_roundtrip_and_unk():
    tp = TextProcessor(vocab_list=default_vocab())
    ids = tp.phonemes_to_ids(["<BOS>", "AH0", "ZZZ_NOT_A_PHONEME", "<EOS>"])
    assert ids[2] == tp.unk_id == tp.padding_id  # UNK falls back to pad id
    phs = tp.ids_to_phonemes(ids[:2])
    assert phs == ["<BOS>", "AH0"]


def test_batch_process_static_padding_and_masks():
    fe = PhonemeFrontend(vocab_list=default_vocab())
    ids, lengths, mask = fe.encode_batch(["hello world", "a"], pad_to=32)
    assert ids.shape == (2, 32) and mask.shape == (2, 32)
    assert mask.dtype == bool and ids.dtype == np.int32
    # True = valid convention; padded region has pad id
    assert mask[0].sum() == lengths[0]
    assert (ids[1, lengths[1]:] == 0).all()
    # no pad-id leakage into the valid region (defect-7 regression guard)
    assert ((ids == 0) & mask).sum() == 0


def test_batch_process_truncation():
    fe = PhonemeFrontend(vocab_list=default_vocab())
    ids, lengths, mask = fe.encode_batch(["one two three four five six seven"], pad_to=5)
    assert ids.shape == (1, 5)
    assert mask.all()
