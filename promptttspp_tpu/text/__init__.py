from promptttspp_tpu.text import eng
from promptttspp_tpu.text.eng import (
    num_vocab,
    sequence_to_text,
    symbol_to_id,
    text_to_sequence,
)

__all__ = [
    "eng",
    "num_vocab",
    "sequence_to_text",
    "symbol_to_id",
    "text_to_sequence",
]
