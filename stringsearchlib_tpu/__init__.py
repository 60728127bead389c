"""stringsearchlib_tpu: TPU-native n-gram fuzzy string search.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
serena-yu17/StringSearchLib (a Windows C++ DLL): n-gram inverted-index fuzzy
search with a semi-global edit-distance tier for short strings, master-key
mapping with per-pair weights, thresholded scoring with exact-match
promotion, and multi-chip sharding over a ``jax.sharding.Mesh``.

Two API styles:

  * :class:`StringSearchIndex` - the pythonic object API;
  * :mod:`stringsearchlib_tpu.api.capi` - the reference-compatible flat
    surface (``indexN``/``index``/``indexW``/``index2D``/``search``/``score``/
    ``dispose``/``getSize``/``getLibSize``/``setValidChar``, handle- and
    guid-keyed).
"""

from __future__ import annotations

import os as _os

# On this class of VM (THP defrag=madvise + fragmented memory), numpy's
# madvise(MADV_HUGEPAGE) makes first-touch of large fresh allocations ~60MB/s
# (synchronous compaction per fault).  Disable it before numpy loads; ~30x
# faster index builds.  No effect if numpy is already imported.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

from typing import Optional, Sequence

from .config import DEFAULT_VALID_CHARS, IndexConfig
from .index.build import HostIndex, build_index
from .search.engine import SearchEngine

__version__ = "0.1.0"


class StringSearchIndex:
    """One indexed library: build once, search many times.

    Equivalent of the reference's ``StringIndex`` (nGramSearch.h:104-314)
    with the README's documented extensions (wide strings, 2D rows,
    gram_size 2-4).
    """

    def __init__(
        self,
        words: Sequence,
        row_size: int = 1,
        weights: Optional[Sequence[float]] = None,
        gram_size: int = 3,
        wide: bool = False,
        valid_chars: bytes = DEFAULT_VALID_CHARS,
    ):
        cfg = IndexConfig(gram_size=gram_size, wide=wide)
        self.host: HostIndex = build_index(words, row_size, weights, cfg, valid_chars)
        self.engine = SearchEngine(self.host)

    def search(self, query, threshold: float = 0.0, limit: int = 100) -> list:
        """Ranked result strings (score desc, key length asc)."""
        results, _ = self.engine.search(query, threshold, limit)
        return results

    def score(self, query, threshold: float = 0.0, limit: int = 100):
        """(result strings, scores)."""
        return self.engine.search(query, threshold, limit)

    def size(self) -> int:
        """Distinct normalized terms (reference getSize)."""
        return self.host.n_terms

    def lib_size(self) -> int:
        """Distinct gram hashes (reference getLibSize)."""
        return self.host.n_grams

    def set_valid_char(self, chars) -> None:
        if isinstance(chars, str):
            chars = chars.encode("latin-1")
        self.host.set_valid_char(bytes(chars))

    def save(self, path) -> None:
        """Persist the built index (arrays only; loads skip the build)."""
        from .index.serialize import save_index

        save_index(self.host, path)

    @classmethod
    def load(cls, path) -> "StringSearchIndex":
        """Reconstruct an index saved with :meth:`save`."""
        from .index.serialize import load_index

        obj = cls.__new__(cls)
        obj.host = load_index(path)
        obj.engine = SearchEngine(obj.host)
        return obj


__all__ = [
    "StringSearchIndex",
    "IndexConfig",
    "DEFAULT_VALID_CHARS",
    "build_index",
    "HostIndex",
    "SearchEngine",
    "__version__",
]
