"""Deterministic synthetic transcript corpus generator (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

Same seed → byte-identical table. Word frequencies are Zipf so hot-term skew
is real (exercises the salted two-level aggregation); the text stream embeds
the tokenizer edge cases (URLs, wrapping quotes, accents, boilerplate tails,
numbered lists, empties) that the reference pipeline handles at
``src/common.py:45-101`` and ``src/merge_datasets.py:98-137``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 2000
_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "calculator", "browser", "python", "sql"])

_EDGE_TEMPLATES = [
    "",  # empty turn
    '"{body}"',  # wrapping quotes
    "{body} visit https://example.com/x?q=1 and www.test.org today",
    "{body} café naïve résumé über",
    "{body} [Written by MAL Rewrite] hidden trailing text",
    "{body} (source: wikipedia) trailing attribution",
    "1. first item 2) second item\n{body}",
    "  {body}  ",  # surrounding whitespace
    "it's a story they can't won't forget {body}",
]


def make_vocab() -> np.ndarray:
    """Fixed vocabulary: a few realistic words + generated terms."""
    base = (
        "story hero battle magic world friend school journey power dream "
        "spirit demon sword night city future memory truth shadow light "
        "robot space pirate music dance love war peace king queen dragon"
    ).split()
    gen = [f"term{i:04d}" for i in range(VOCAB_SIZE - len(base))]
    return np.array(base + gen)


def gen_transcripts_pandas(
    n_turns: int, seed: int = 42, conv_prefix: str = ""
) -> pd.DataFrame:
    """``conv_prefix`` namespaces conv_ids so distributed chunks never
    collide (chunk i uses prefix f"{i:04d}-")."""
    rng = np.random.default_rng(seed)
    vocab = make_vocab()

    # conversations: Zipf-ish turn counts in [1, 64]
    conv_sizes = []
    total = 0
    while total < n_turns:
        size = int(min(64, 1 + rng.zipf(1.3) % 64))
        conv_sizes.append(size)
        total += size
    conv_sizes[-1] -= total - n_turns
    if conv_sizes[-1] == 0:
        conv_sizes.pop()
    conv_sizes = np.array(conv_sizes, dtype="int64")
    n_conv = len(conv_sizes)

    conv_ids = np.repeat(
        np.array([f"conv-{conv_prefix}{i:08d}" for i in range(n_conv)]), conv_sizes
    )
    turn_idx = np.concatenate([np.arange(s, dtype="int32") for s in conv_sizes])

    roles = _ROLES[rng.choice(len(_ROLES), size=n_turns, p=[0.45, 0.45, 0.05, 0.05])]
    tools = np.where(
        roles == "tool", _TOOLS[rng.integers(0, len(_TOOLS), size=n_turns)], None
    )

    # Zipf word draw over the vocabulary; 3..60 words per turn
    words_per_turn = rng.integers(3, 60, size=n_turns)
    total_words = int(words_per_turn.sum())
    word_ids = (rng.zipf(1.25, size=total_words) - 1) % len(vocab)
    flat_words = vocab[word_ids]
    offsets = np.concatenate([[0], np.cumsum(words_per_turn)])
    texts = [
        " ".join(flat_words[offsets[i] : offsets[i + 1]]) for i in range(n_turns)
    ]

    # sprinkle edge-case templates on a deterministic ~3% of turns
    edge_rows = rng.choice(n_turns, size=max(1, n_turns // 33), replace=False)
    for j, row in enumerate(edge_rows):
        tpl = _EDGE_TEMPLATES[j % len(_EDGE_TEMPLATES)]
        texts[row] = tpl.format(body=texts[row]) if "{body}" in tpl else tpl

    base_ts = np.datetime64("2025-01-01T00:00:00")
    ts = base_ts + np.cumsum(rng.integers(1, 30, size=n_turns)).astype("timedelta64[s]")

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def gen_transcripts(spark, n_turns: int, seed: int = 42, partitions: int | None = None):
    """Seeded transcript corpus as a Spark DataFrame."""
    pdf = gen_transcripts_pandas(n_turns, seed)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


def gen_transcripts_distributed(spark, n_turns: int, seed: int = 42,
                                chunks: int = 64):
    """Seeded corpus generated IN PARALLEL: chunk i generates n/chunks
    turns with rng seed (seed, i) and conv-id namespace i — deterministic
    for a given (n_turns, seed, chunks) and fast enough for multi-million
    turn benchmark corpora (driver-side pandas generation is single-core).
    """
    per_chunk = n_turns // chunks
    extra = n_turns - per_chunk * chunks
    plan = [(i, per_chunk + (1 if i < extra else 0), seed) for i in range(chunks)]
    plan_df = spark.createDataFrame(plan, "chunk int, n int, seed int")

    def gen(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.n <= 0:
                    continue
                yield gen_transcripts_pandas(
                    int(row.n), seed=int(row.seed) * 100003 + int(row.chunk),
                    conv_prefix=f"{int(row.chunk):04d}-",
                )

    return plan_df.repartition(chunks, "chunk").mapInPandas(
        gen, schema=TRANSCRIPT_SCHEMA
    )


def write_transcripts(spark, path: str, n_turns: int, seed: int = 42,
                      distributed_threshold: int = 2_000_000) -> None:
    gen = (
        gen_transcripts_distributed(spark, n_turns, seed)
        if n_turns >= distributed_threshold
        else gen_transcripts(spark, n_turns, seed)
    )
    gen.write.mode("overwrite").parquet(path)
