"""NeRF-style positional encoding with the reference's quirks.

Re-design of /root/reference/main/decoder_utils/pos_encoding.py:4-50:
default is **linear** (not logarithmic) frequency-band spacing from 2^0 to
2^(num_freqs-1), include_input=True, [sin, cos] per band — out_dim = 63
for 3D input with 10 bands.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Embedder:
    include_input: bool = True
    input_dims: int = 3
    num_freqs: int = 10
    log_sampling: bool = False

    @property
    def freq_bands(self) -> np.ndarray:
        max_freq = self.num_freqs - 1
        if self.log_sampling:
            return 2.0 ** np.linspace(0.0, max_freq, self.num_freqs)
        return np.linspace(2.0 ** 0.0, 2.0 ** max_freq, self.num_freqs)

    @property
    def out_dim(self) -> int:
        d = self.input_dims if self.include_input else 0
        return d + 2 * self.num_freqs * self.input_dims

    def __call__(self, x):
        parts = [x] if self.include_input else []
        for freq in self.freq_bands:
            parts.append(jnp.sin(x * freq))
            parts.append(jnp.cos(x * freq))
        return jnp.concatenate(parts, axis=-1)
