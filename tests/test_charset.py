import numpy as np

from tpgsr_tpu.charset import (
    CTC_CHARS,
    CTC_NUM_CLASSES,
    AsterInfo,
    CTCLabelConverter,
    encode_ctc_padded,
    get_vocabulary,
    str_filt,
)


def test_ctc_charset():
    assert CTC_NUM_CLASSES == 37
    assert CTC_CHARS[0] == "-"
    assert CTC_CHARS[1] == "0"
    assert CTC_CHARS[-1] == "z"


def test_str_filt():
    assert str_filt("Hello, World!", "lower") == "helloworld"
    assert str_filt("Hello, World!", "upper") == "HelloWorld"
    assert str_filt("abc123", "digit") == "123"
    assert str_filt("Hello, World!", "all") == "Hello,World!"


def test_vocabulary():
    voc = get_vocabulary("all")
    assert voc[-3:] == ["EOS", "PADDING", "UNKNOWN"]
    assert len(voc) == 10 + 52 + len(__import__("string").punctuation) + 3
    info = AsterInfo("all")
    assert info.rec_num_classes == len(voc)
    assert info.char2id["EOS"] == voc.index("EOS")


def test_ctc_converter_roundtrip():
    conv = CTCLabelConverter()
    ids, lengths = conv.encode(["hello", "a1"])
    assert lengths.tolist() == [5, 2]
    # decode collapses repeated frames (CTC semantics): 'll' -> 'l'
    assert conv.decode(ids[:5], 5) == "helo"
    assert conv.decode(ids[:5], 5, raw=True) == "hello"
    # blank separates the l's so both are emitted: "hello"
    raw = [conv.dict["h"], conv.dict["h"], conv.dict["e"], conv.dict["l"], 0, conv.dict["l"], conv.dict["o"]]
    assert conv.decode(raw, len(raw)) == "hello"


def test_encode_ctc_padded():
    labels, lengths = encode_ctc_padded(["ab", "Hello!", ""], max_label_len=6)
    assert labels.shape == (3, 6)
    assert lengths.tolist() == [2, 5, 0]
    # 'a' -> index of 'a' in '-0123456789a..' = 11
    assert labels[0, 0] == 11
    assert labels[0, 2:].tolist() == [0, 0, 0, 0]
