from promptttspp_tpu.text import eng


def test_vocab_size():
    assert eng.num_vocab() == 90
    assert eng.symbols[0] == "_"  # PAD must be id 0 (padding_idx)
    assert eng.symbols[1] == "^"
    assert eng.symbols[2] == "$"


def test_known_ids_stable():
    # spot-check ids against the reference inventory ordering
    assert eng.symbol_to_id("AA") == 3
    assert eng.symbol_to_id("sp") == 89
    assert eng.symbol_to_id("sil") == 88
    assert eng.symbol_to_id("spn") == 87


def test_roundtrip():
    seq = eng.text_to_sequence("HH AH0 L OW1")
    assert seq[0] == 1 and seq[-1] == 2
    assert eng.sequence_to_text(seq, remove_special_token=True) == [
        "HH", "AH0", "L", "OW1",
    ]
    assert eng.text_to_sequence("B D", add_special_token=False) == [
        eng.symbol_to_id("B"), eng.symbol_to_id("D"),
    ]
