"""Tokenizer tests: reference goldens (examples/test_tokenizer.cpp:70-73)
plus the documented behavioral quirks (SURVEY.md §7)."""

import pytest

from bert_tpu.tokenizer import WordPieceTokenizer, normalize, split_words
from bert_tpu.vocab import Vocab
from fixture_vocab import GOLDEN_CASES, build_fixture_vocab


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer(build_fixture_vocab(), warn_unknown=False)


@pytest.mark.parametrize("case", range(len(GOLDEN_CASES)))
def test_golden(tok, case):
    text, expected = GOLDEN_CASES[case]
    assert tok.tokenize(text, 512) == expected


def test_normalize_accents_and_case():
    # bert.cpp:206-251 — accent fold + ASCII lowercase only
    assert normalize("Québec") == "quebec"
    assert normalize("TÄÄLLÄ") == "taalla"
    assert normalize("ÀÉÎÕÜ ñÇ") == "aeiou nc"


def test_split_words_posix_classes():
    # bert.cpp:270 — punct | alpha+ | digit+; whitespace & non-ASCII dropped
    assert split_words("i'm 2:30") == ["i", "'", "m", "2", ":", "30"]
    assert split_words("a  \t b") == ["a", "b"]
    assert split_words("abc123def") == ["abc", "123", "def"]
    # non-ASCII that survives accent stripping is dropped by the splitter
    assert split_words("日本語 ok") == ["ok"]


def test_unknown_char_dropped_no_unk(tok):
    # bert.cpp:317-320: unknown chars are skipped, no [UNK] emitted
    v = tok.vocab
    # 'ø' is not in the accent map → survives normalize → dropped at split
    assert tok.tokenize("bø", 512) == [v.cls_id, v.token_to_id["b"], v.sep_id]


def test_unknown_switches_to_subword_map():
    # after a skipped unknown char the matcher uses the SUBWORD map
    vocab = Vocab.from_tokens(["[PAD]", "[CLS]", "[SEP]", "q", "##z", "z"])
    t = WordPieceTokenizer(vocab, warn_unknown=False)
    cls, sep = vocab.cls_id, vocab.sep_id
    # word "qz": 'q' matches whole-word, then "z" must come from subword map
    assert t.tokenize("qz") == [cls, 3, 4, sep]


def test_whole_word_match_switches_map():
    # bert.cpp:310: ANY match (even the first) switches to the subword map
    vocab = Vocab.from_tokens(["[PAD]", "[CLS]", "[SEP]", "ab", "cd", "##cd"])
    t = WordPieceTokenizer(vocab, warn_unknown=False)
    # "abcd": "ab" whole-word, then "cd" must hit ##cd (id 5), not cd (id 4)
    assert t.tokenize("abcd") == [vocab.cls_id, 3, 5, vocab.sep_id]


def test_truncation(tok):
    # bert.cpp:300,323 — emit up to n_max_tokens-1, then always [SEP]
    text = " ".join(["go"] * 100)
    ids = tok.tokenize(text, 16)
    assert len(ids) == 16
    assert ids[0] == tok.vocab.cls_id
    assert ids[-1] == tok.vocab.sep_id
    assert all(t == tok.vocab.token_to_id["go"] for t in ids[1:-1])


def test_greedy_longest_match(tok):
    v = tok.vocab
    # "soon" must win over prefix "so"
    assert tok.tokenize("soon", 512) == [v.cls_id, 2574, v.sep_id]
    assert tok.tokenize("so", 512) == [v.cls_id, 2061, v.sep_id]


def test_vocab_first_wins_and_subword_map():
    vocab = Vocab.from_tokens(["[PAD]", "x", "x", "##x"])
    assert vocab.token_to_id["x"] == 1  # first id wins (bert.cpp:397)
    assert vocab.subword_token_to_id["x"] == 3
    assert vocab.id_to_token(3) == "##x"


def test_pad_batch(tok):
    ids, mask = tok.pad_batch([[101, 5, 102], [101, 102]], seq_len=4)
    assert ids.shape == (2, 4) and mask.shape == (2, 4)
    assert list(ids[0]) == [101, 5, 102, tok.vocab.pad_id]
    assert list(mask[0]) == [1, 1, 1, 0]
    assert list(mask[1]) == [1, 1, 0, 0]


def test_pad_batch_truncation_preserves_trailing_sep():
    """eval_tokens with an over-long pre-tokenized list: truncation must
    keep the trailing [SEP] (truncate-then-[SEP] contract), not chop it
    off mid-word (review r4)."""
    from fixture_vocab import build_fixture_vocab

    tok = WordPieceTokenizer(build_fixture_vocab(), warn_unknown=False)
    long_ids = tok.tokenize(" ".join(["go"] * 100))  # well-formed, >16 toks
    assert len(long_ids) > 16
    ids, mask = tok.pad_batch([long_ids], seq_len=16)
    assert mask[0].sum() == 16
    assert ids[0, 0] == tok.vocab.cls_id
    assert ids[0, 15] == tok.vocab.sep_id  # preserved across truncation
    assert list(ids[0, :15]) == long_ids[:15]
