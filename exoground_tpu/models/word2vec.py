"""Frozen MIL-NCE word2vec text tower + tokenizer.

Rebuild of reference model/word2vec_model.py:26-102 (itself extracted from the
MIL-NCE S3D checkpoint): regex word split, dict lookup over the 66k-entry
``s3d_dict.npy`` vocabulary, pad/truncate to ``max_words``; then
embed -> fc1 -> ReLU -> masked max-pool -> fc2.

The tokenizer is host-side numpy (it runs in data workers); the model is a
tiny jittable function over a params pytree so it can fuse into the text
branch of whatever model consumes it. Weights come from the torch checkpoint
via utils/convert.py.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

_WORD_RE = re.compile(r"[\w']+")


class Word2VecTokenizer:
    """Word-level tokenizer over a token->word dict (reference :26-73).

    ``vocab`` maps word -> token id (0 is the OOV/pad id).
    """

    def __init__(self, vocab: Dict[str, int], max_words: int = 32):
        self.word_to_token = vocab
        self.token_to_word = {v: k for k, v in vocab.items()}
        self.max_words = max_words

    @classmethod
    def from_dict_file(cls, dict_path: str, max_words: int = 32) -> "Word2VecTokenizer":
        """Load from the MIL-NCE ``s3d_dict.npy`` token->word array.

        Token ids start at 1 (matching reference s3d_milnce/s3dg.py:198-205
        which builds word_to_token from the array with +1 offset).
        """
        words = np.load(dict_path)
        vocab = {str(w): i + 1 for i, w in enumerate(words)}
        return cls(vocab, max_words)

    def _split(self, sentence: str) -> List[str]:
        return _WORD_RE.findall(str(sentence).lower())

    def _words_to_ids(self, words: Sequence[str]) -> List[int]:
        ids = [self.word_to_token.get(w, 0) for w in words[: self.max_words]]
        ids.extend([0] * (self.max_words - len(ids)))
        return ids

    def tokenize(self, inputs: Union[str, List[str]]):
        """sentence -> [word, ...] or [sentence, ...] -> [[word, ...], ...]
        (reference :52-58). NB unlike the reference, __call__ always returns
        BATCHED (B, max_words) arrays — a str input is a batch of one."""
        if isinstance(inputs, str):
            return self._split(inputs)
        return [self._split(s) for s in inputs]

    def __call__(
        self, inputs: Union[str, List[str]], padding: bool = True, **_
    ) -> Dict[str, np.ndarray]:
        assert padding, "only padded tokenization is supported"
        if isinstance(inputs, str):
            inputs = [inputs]
        ids = np.asarray([self._words_to_ids(self._split(s)) for s in inputs], dtype=np.int32)
        mask = (ids != 0).astype(np.int32)
        return {"input_ids": ids, "attention_mask": mask}


def word2vec_forward(
    params: Dict, input_ids: jnp.ndarray, attention_mask: jnp.ndarray | None = None
) -> Dict[str, jnp.ndarray]:
    """Frozen text tower (reference model/word2vec_model.py:84-102).

    params: {'word_embd': (V, 300), 'fc1': {'kernel','bias'}, 'fc2': {...}}
    input_ids: (B, L) int; attention_mask: (B, L), 1 = keep.
    Returns last_hidden_state (B, L, 512) and pooler_output (B, 512).
    """
    x = params["word_embd"][input_ids]  # (B, L, 300)
    x = jax.nn.relu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    if attention_mask is not None:
        # all-stop-word sentences keep every position (reference :95)
        keep = attention_mask.astype(bool)
        keep = jnp.where(jnp.any(keep, axis=-1, keepdims=True), keep, True)
        pooled = jnp.max(jnp.where(keep[:, :, None], x, -6e4), axis=1)
    else:
        pooled = jnp.max(x, axis=1)
    fc2 = lambda y: y @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    return {"last_hidden_state": fc2(x), "pooler_output": fc2(pooled)}


class Word2VecModel:
    """Convenience wrapper holding frozen params (HF-like call signature)."""

    def __init__(self, params: Dict):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._fn = jax.jit(word2vec_forward)

    def __call__(self, input_ids, attention_mask=None, **_):
        return self._fn(self.params, jnp.asarray(input_ids),
                        None if attention_mask is None else jnp.asarray(attention_mask))
