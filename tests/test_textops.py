"""Unit vectors for the text scalar ops (FIXTURES.md §3 normalize_cases)."""

from deepseek_ocr_rs_ray.functions import textops as T


def test_normalize_text_crlf_sentinel_trim():
    assert T.normalize_text("a\r\nb") == "a\nb"
    assert T.normalize_text("  x <｜end▁of▁sentence｜> ") == "x"
    assert T.normalize_text("\r\n<｜end▁of▁sentence｜>\r\n") == ""
    assert T.normalize_text(" x ") == "x"  # unicode trim
    assert T.normalize_text("keep\rlone") == "keep\rlone"  # only CRLF replaced


def test_extract_delta_prefix_and_divergence():
    assert T.extract_delta("abc", "abcdef") == "def"
    assert T.extract_delta("", "xyz") == "xyz"
    assert T.extract_delta("abX", "abcd") == "cd"
    # multi-byte chars respect char boundaries
    assert T.extract_delta("héllo", "héllo wörld") == " wörld"


def test_delta_tracker_holds_back_replacement_char():
    d = T.DeltaTracker()
    assert d.advance("he", False) == "he"
    # trailing U+FFFD (incomplete UTF-8) held back until final
    assert d.advance("hell�", False) == "ll"
    assert d.advance("hell�", True) == "�"
    d.reset()
    assert d.advance("�x", False) == ""     # delta starts with U+FFFD
    assert d.advance("�x", True) == "�x"


def test_token_counts():
    assert T.ws_token_count("  a  b\tc\n") == 3
    assert T.ws_token_count("") == 0
    assert T.ws_token_count("   ") == 0
    assert T.bpe_ish_token_count("Hello, world42!") == 5  # Hello , world 42 !
    assert T.bpe_ish_token_count("") == 0


def test_detect_lang():
    assert T.detect_lang("the cat and the dog are in the house") == "en"
    assert T.detect_lang("der Hund und die Katze sind nicht da") == "de"
    assert T.detect_lang("le chat et le chien sont dans la maison") == "fr"
    assert T.detect_lang("这是一个测试") == "zh"
    assert T.detect_lang("zzz qqq www") == "unk"
    assert T.detect_lang("") == "unk"


def test_quality_scores_exact():
    q = T.quality_scores("The cat! 42")
    assert q["n_chars"] == 11
    assert q["n_tokens"] == 3
    assert q["mean_token_len"] == (3 + 4 + 2) / 3
    assert q["digit_ratio"] == 2 / 11
    assert q["punct_ratio"] == 1 / 11
    assert q["stopword_ratio"] == 1 / 3


def test_fingerprints_deterministic():
    assert T.rolling_fingerprint("abc") == T.rolling_fingerprint("abc")
    assert T.rolling_fingerprint("abc") != T.rolling_fingerprint("acb")
    assert T.md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert T.crc32_str("abc") == T.crc32_str("abc")


def test_shingles_and_ngrams():
    assert T.shingles("ab", 3) == {"ab"}
    assert T.shingles("abcd", 3) == {"abc", "bcd"}
    assert T.word_ngrams("a b c", 2) == {"a b", "b c"}
    assert T.word_ngrams("", 2) == set()
