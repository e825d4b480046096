"""Phoneme vocabulary encoder.

Capability parity with the reference ``TokenTextEncoder`` (reference:
utils/text_encoder.py:157-304): reserved ids ``<pad>=0, <EOS>=1, <UNK>=2``, encode a
space-separated phoneme string to int ids, decode back, and ``sil_phonemes()`` =
tokens whose first character is not alphabetic.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Sequence

PAD, EOS, UNK = "<pad>", "<EOS>", "<UNK>"
RESERVED_TOKENS = [PAD, EOS, UNK]
PAD_ID, EOS_ID, UNK_ID = 0, 1, 2


class TokenTextEncoder:
    """Maps phoneme tokens <-> integer ids with fairseq-style reserved tokens."""

    def __init__(self, vocab_list: Iterable[str], replace_oov: str | None = None):
        tokens = [t for t in vocab_list if t not in RESERVED_TOKENS]
        self._id_to_token = dict(enumerate(RESERVED_TOKENS + tokens))
        self._token_to_id = {t: i for i, t in self._id_to_token.items()}
        self._replace_oov = replace_oov

    @classmethod
    def from_file(cls, path: str, replace_oov: str | None = None) -> "TokenTextEncoder":
        """Load from a JSON list (``phone_set.json``) or newline-separated vocab file."""
        with open(path) as f:
            if path.endswith(".json"):
                vocab = json.load(f)
            else:
                vocab = [line.strip() for line in f if line.strip()]
        return cls(vocab, replace_oov=replace_oov)

    def store_to_file(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            if path.endswith(".json"):
                json.dump([t for t in self.tokens() if t not in RESERVED_TOKENS], f,
                          ensure_ascii=False)
            else:
                for i in range(len(self)):
                    f.write(self._id_to_token[i] + "\n")

    def encode(self, s: str) -> List[int]:
        toks = s.strip().split()
        if self._replace_oov is not None:
            toks = [t if t in self._token_to_id else self._replace_oov for t in toks]
        return [self._token_to_id[t] for t in toks]

    def decode(self, ids: Sequence[int], strip_padding: bool = False) -> str:
        ids = list(ids)
        if strip_padding and PAD_ID in ids:
            ids = ids[: ids.index(PAD_ID)]
        return " ".join(self._id_to_token.get(i, f"ID_{i}") for i in ids)

    def tokens(self) -> List[str]:
        return [self._id_to_token[i] for i in range(len(self))]

    def sil_phonemes(self) -> List[str]:
        return [t for t in self._token_to_id if t and not t[0].isalpha()]

    def pad(self) -> int:
        return PAD_ID

    def eos(self) -> int:
        return EOS_ID

    def unk(self) -> int:
        return UNK_ID

    @property
    def vocab_size(self) -> int:
        return len(self._id_to_token)

    def __len__(self) -> int:
        return self.vocab_size


def build_phone_encoder(data_dir: str) -> TokenTextEncoder:
    """Load ``<data_dir>/phone_set.json`` (reference: data_gen/tts/base_binarizer.py:92)."""
    return TokenTextEncoder.from_file(os.path.join(data_dir, "phone_set.json"),
                                      replace_oov=",")
