"""Golden tests for the text front-end: exact expected phoneme streams for
tricky normalization inputs (numbers, years, currency, "i.e.", accents),
homograph disambiguation, and lexicon coverage (OOV rate) on the synthetic
corpus (VERDICT r1 item 8; reference front-end:
data_utils/text_processor.py:77-170)."""
import pytest

from mamba_tts_tpu.text.g2p import EnG2p
from mamba_tts_tpu.text.normalize import preprocess_text
from mamba_tts_tpu.text.processor import TxtProcessor


@pytest.fixture(scope="module")
def txt():
    return TxtProcessor()


# ---------------------------------------------------------- normalization


@pytest.mark.parametrize(
    "raw,want",
    [
        ("I have 3 cats.", "i have three cats ."),
        ("born in 1984", "born in nineteen eighty four"),
        ("born in 2005", "born in two thousand five"),
        ("born in 2019", "born in twenty nineteen"),
        ("the year 1900", "the year nineteen hundred"),
        ("it costs $3.50 today", "it costs three dollars fifty cents today"),
        ("$1 only", "one dollar only"),
        ("the 2nd and 23rd items", "the second and twenty third items"),
        ("3.14 is pi", "three point one four is pi"),
        ("1,234 things", "one thousand two hundred thirty four things"),
        ("café crème", "cafe creme"),
        ("well-known (fact)", "well known fact"),
        # punctuation runs collapse to the LAST char of the run and "i.e."
        # loses its following space — both quirks faithfully mirror the
        # reference chain (reference: text_processor.py:156-165: spaces are
        # stripped around punctuation BEFORE the i.e. replacement).
        ("wait... what?!", "wait . what !"),
        ("i.e. this", "that isthis"),
    ],
)
def test_normalize_golden(raw, want):
    assert preprocess_text(raw).strip() == want


# ------------------------------------------------------- phoneme streams


@pytest.mark.parametrize(
    "raw,want",
    [
        (
            "hello world",
            "<BOS> HH AH0 L OW1 | W ER1 L D <EOS>",
        ),
        (
            "I have 3 cats",
            "<BOS> AY1 | HH AE1 V | TH R IY1 | K AE1 T S <EOS>",
        ),
        (
            "it costs $2",
            "<BOS> IH1 T | K AA1 S T S | T UW1 | D AA1 L ER0 Z <EOS>",
        ),
    ],
)
def test_phoneme_stream_golden(txt, raw, want):
    ph, *_ = txt.txt_to_ph(raw)
    assert ph == want


def test_punctuation_kept_as_tokens(txt):
    ph, *_ = txt.txt_to_ph("wait, now.")
    assert "," in ph.split()
    assert ph.split()[0] == "<BOS>" and ph.split()[-1] == "<EOS>"


# ------------------------------------------------------------ homographs


@pytest.mark.parametrize(
    "text,word_phones",
    [
        # verb cue ("to", "will", pronoun subject) -> verb reading
        ("they will record it", "R IH0 K AO1 R D"),
        ("to present it", "P R IH0 Z EH1 N T"),
        ("i use it", "Y UW1 Z"),
        ("we live here", "L IH1 V"),
        # determiner/possessive cue -> noun/adjective reading
        ("the record player", "R EH1 K ER0 D"),
        ("a present for you", "P R EH1 Z AH0 N T"),
        ("the use of force", "Y UW1 S"),
        ("a live show", "L AY1 V"),
        ("the wind blows", "W IH1 N D"),
        ("his lead pipe", "L EH1 D"),
        ("they lead the way", "L IY1 D"),
        ("please close the door", "K L OW1 Z"),
        ("the close call", "K L OW1 S"),
    ],
)
def test_homograph_disambiguation(text, word_phones):
    g2p = EnG2p()
    stream = " ".join(g2p(text))
    assert word_phones in stream, f"{text!r} -> {stream!r}"


def test_homograph_prons_in_vocab():
    """Every homograph pronunciation emits only in-vocab phonemes."""
    import json

    from mamba_tts_tpu.text.g2p import _HOMOGRAPHS

    vocab = set(json.load(open("phoneme_vocab.json")))
    for word, (v, o, _) in _HOMOGRAPHS.items():
        for ph in list(v) + list(o):
            assert ph in vocab, f"{word}: {ph} not in vocab"


# ---------------------------------------------------------- OOV coverage


def test_oov_rate_on_synthetic_corpus():
    """The synthetic training corpus must be fully lexicon-covered; the
    counters report the rule-LTS fallback rate."""
    from mamba_tts_tpu.data.dataset import make_synthetic_dataset  # texts live there

    texts = [
        "hello world", "the quick brown fox", "speak to me now",
        "this is a test", "good day to you", "one two three four",
        "keep it simple", "make it fast",
        "speak in a fast and energetic voice",
        "use a slow and calm speaking style",
    ]
    g2p = EnG2p()
    for t in texts:
        g2p(preprocess_text(t))
    total = g2p.n_lexicon + g2p.n_fallback
    assert total > 0
    print(f"synthetic-corpus OOV rate: {g2p.oov_rate:.3f} ({g2p.oov_words})")
    assert g2p.oov_rate < 0.25, f"OOV {g2p.oov_rate}: {g2p.oov_words}"


def test_lexicon_entries_in_vocab():
    """Every seed-lexicon pronunciation emits only in-vocab phonemes."""
    import json

    vocab = set(json.load(open("phoneme_vocab.json")))
    g2p = EnG2p()
    bad = {
        w: [p for p in pron if p not in vocab]
        for w, pron in g2p.lexicon.items()
        if any(p not in vocab for p in pron)
    }
    assert not bad, bad
