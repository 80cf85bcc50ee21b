"""Engine-wide configuration constants.

The reference (RLAlpha49/AniSearch-Model) hardcodes its retrieval knobs in
``src/api.py`` (results_per_page=10, max query length 2000) and its text
pipeline in ``src/common.py:45-101``.  We freeze the equivalent knobs here so
that the single-node oracle and the distributed engine share one source of
truth — the reference's failure mode (tokenizer drift between the api path,
which only strips, and the test path, which fully normalizes;
``src/api.py:413`` vs ``src/test.py:153``) is exactly what this module
prevents.
"""

from __future__ import annotations

from dataclasses import dataclass

TOKENIZER_VERSION = "asms-tok-1"

# BM25 parameters (Robertson/Sparck-Jones defaults; FIXTURES.md §3).
BM25_K1 = 1.2
BM25_B = 0.75

# Query admission limit, mirroring reference src/api.py:239-241.
MAX_QUERY_CHARS = 2000

# Default page size, mirroring reference src/api.py:357.
RESULTS_PER_PAGE = 10

# Posting-list block size (docs per compressed block).
POSTING_BLOCK_SIZE = 128

# Frozen English stopword list (deterministic subset of the NLTK english set
# the reference loads at src/common.py:24; frozen in-repo so the engine never
# depends on a downloadable corpus).
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more
    most my myself no nor not now of off on once only or other our ours
    ourselves out over own same she should so some such than that the their
    theirs them themselves then there these they this those through to too
    under until up very was we were what when where which while who whom why
    will with you your yours yourself yourselves""".split()
)

# Frozen contraction-expansion table (reference uses the `contractions`
# package at src/common.py:71; we pin a deterministic subset so oracle and
# engine can never diverge on an upstream package version).
CONTRACTIONS = {
    "can't": "cannot",
    "won't": "will not",
    "n't": " not",
    "'re": " are",
    "'ve": " have",
    "'ll": " will",
    "'d": " would",
    "'m": " am",
    "it's": "it is",
    "let's": "let us",
}


@dataclass(frozen=True)
class BM25Params:
    k1: float = BM25_K1
    b: float = BM25_B

    def as_dict(self) -> dict:
        return {"k1": self.k1, "b": self.b}
