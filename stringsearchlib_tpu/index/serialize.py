"""Index persistence: save/load a built HostIndex as one ``.npz`` file.

The reference has no persistence at all - every process start re-runs the
full build (SURVEY section 5; indexes live only inside the DLL's process,
dllmain.cpp:22-24).  For a 10M-key index the shingle pass dominates startup,
so this module adds the checkpoint/resume subsystem the reference lacks:
every array the engine needs is written once and mapped straight back into
HBM on load, skipping normalization, dedup and shingling entirely.

Format: numpy ``.npz`` (zip of .npy) with a format-version guard.  All
entries are plain arrays; config scalars travel in a small int/byte header.
Loads are exact - a loaded index returns bit-identical scores and ranks to
the freshly built one (tested in tests/test_serialize.py).
"""

from __future__ import annotations

import io
import os
from typing import Union

import jax.numpy as jnp
import numpy as np

from ..config import IndexConfig
from ..core import grams as gramlib
from ..core import text as textlib
from .arrays import DeviceIndex
from .build import HostIndex, KeyStrings

FORMAT_VERSION = 2  # v2: primary-edge decomposition arrays added

# DeviceIndex fields saved verbatim (all reconstructed with jnp.asarray).
_DEVICE_FIELDS = (
    "short_tokens", "short_lengths", "long_tokens", "long_lengths",
    "gram_ptr", "gram_terms",
    "edge_term", "edge_key", "edge_weight",
    "term_edge_ptr", "term_wmax",
    "term_prim_key", "term_prim_weight",
    "term_extra_ptr", "extra_key", "extra_weight",
    "key_edge_ptr", "key_edge_term", "key_edge_weight",
    "key_len",
)

# stored narrow (uint8/uint32), widened to int32 on device at load
_TOKEN_FIELDS = frozenset({"short_tokens", "long_tokens"})


def save_index(host: HostIndex, path: Union[str, os.PathLike, io.IOBase]) -> None:
    """Write every array a HostIndex needs to ``path`` (.npz)."""
    cfg = host.config
    payload: dict[str, np.ndarray] = {
        "format_version": np.int64(FORMAT_VERSION),
        "gram_size": np.int64(cfg.gram_size),
        "wide": np.int64(int(cfg.wide)),
        "short_pad": np.int64(cfg.short_pad),
        "long_pad": np.int64(cfg.long_pad),
        "query_pad": np.int64(cfg.query_pad),
        # 0 = "simple" (default), 1 = "c" (ASCII-only towupper parity)
        "wide_upper_c": np.int64(int(cfg.wide_upper == "c")),
        "valid_chars": np.frombuffer(host.tables.valid_chars, dtype=np.uint8),
        "n_terms": np.int64(host.n_terms),
        "max_term_len": np.int64(host.max_term_len),
        "indexed": np.int64(int(host.indexed)),
        "gram_ids": host.gram_ids,
        "key_tokens": host.key_strings.tokens,
        "key_lengths": host.key_strings.lengths,
        "host_key_norm_tokens": host.host_key_norm_tokens,
        "host_key_norm_lengths": host.host_key_norm_lengths,
        "host_key_edge_counts": host.host_key_edge_counts,
    }
    for f in _DEVICE_FIELDS:
        arr = np.asarray(getattr(host.device, f))
        # token matrices are stored at their narrowest dtype (byte strings
        # fit uint8); load widens on device.  npy records the dtype, so
        # files with either width load identically.
        if f in _TOKEN_FIELDS and arr.size and arr.dtype == np.int32:
            if arr.max() < 256 and arr.min() >= 0:
                arr = arr.astype(np.uint8)
            else:
                arr = arr.astype(np.uint32)
        payload["dev_" + f] = arr
    if host.vocab is not None:
        payload["vocab_codepoints"] = host.vocab.codepoints
    np.savez_compressed(path, **payload)


def load_index(path: Union[str, os.PathLike, io.IOBase]) -> HostIndex:
    """Reconstruct a HostIndex saved by :func:`save_index`."""
    with np.load(path) as z:
        version = int(z["format_version"])
        if version != FORMAT_VERSION:
            raise ValueError(
                f"unsupported index format version {version} "
                f"(this build reads {FORMAT_VERSION})"
            )
        cfg = IndexConfig(
            gram_size=int(z["gram_size"]),
            wide=bool(int(z["wide"])),
            short_pad=int(z["short_pad"]),
            long_pad=int(z["long_pad"]),
            query_pad=int(z["query_pad"]),
            wide_upper=(
                "c"
                if "wide_upper_c" in z.files and int(z["wide_upper_c"])
                else "simple"
            ),
        )
        valid_chars = z["valid_chars"].tobytes()
        tables = textlib.TextTables(
            valid_chars, wide=cfg.wide, wide_upper=cfg.wide_upper
        )

        def _tok(arr):
            # byte tokens stay uint8 on device (see build._upload_tokens);
            # wide/legacy widths widen to int32
            a = jnp.asarray(arr)
            return a if arr.dtype == np.uint8 else a.astype(jnp.int32)

        dev = DeviceIndex(
            **{
                f: (
                    _tok(z["dev_" + f])
                    if f in _TOKEN_FIELDS
                    else jnp.asarray(z["dev_" + f])
                )
                for f in _DEVICE_FIELDS
            }
        )
        vocab = None
        if "vocab_codepoints" in z.files:
            vocab = gramlib.WideVocab(z["vocab_codepoints"])

        gram_ptr = z["dev_gram_ptr"]
        return HostIndex(
            config=cfg,
            tables=tables,
            key_strings=KeyStrings(z["key_tokens"], z["key_lengths"], cfg.wide),
            gram_ids=z["gram_ids"],
            device=dev,
            n_terms=int(z["n_terms"]),
            max_term_len=int(z["max_term_len"]),
            vocab=vocab,
            indexed=bool(int(z["indexed"])),
            host_posting_lens=np.diff(gram_ptr).astype(np.int64),
            host_key_norm_tokens=z["host_key_norm_tokens"],
            host_key_norm_lengths=np.asarray(
                z["host_key_norm_lengths"], np.int32
            ),
            host_key_edge_counts=np.asarray(
                z["host_key_edge_counts"], np.int32
            ),
            host_long_lengths=np.asarray(z["dev_long_lengths"], np.int32),
            host_key_edge_ptr=np.asarray(z["dev_key_edge_ptr"]),
            host_key_edge_term=np.asarray(z["dev_key_edge_term"]),
            host_key_edge_weight=np.asarray(z["dev_key_edge_weight"]),
            # recomputed rather than stored: the key->edge CSR carries the
            # same weights the term->key edges do
            uniform_weights=bool(
                z["dev_key_edge_weight"].size == 0
                or np.all(z["dev_key_edge_weight"] == 1.0)
            ),
        )
