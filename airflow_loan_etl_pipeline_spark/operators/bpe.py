"""A real (small) BPE tokenizer for the corpus-build pipeline.

The heuristic `docs_bpe_token_estimate` guesses token counts from
character length; this module trains actual byte-pair-encoding merges
on the corpus and encodes documents with them, so sequence packing and
token budgeting can run against REAL token counts.

Scale shape (the standard Sennrich split):

- TRAINING aggregates the corpus to its (word, count) table first —
  one distributed hash aggregate; everything after runs on the compact
  vocabulary, never the corpus. The driver-side merge loop consumes
  the top-``max_vocab_words`` words by count (a bounded TakeOrdered
  collect — tokenizer training is vocabulary-sized by construction;
  every production BPE trainer works from this table).
- ENCODING broadcasts the merge ranks into an Arrow-batched
  ``mapInPandas`` — one corpus scan, no shuffle, no driver hop.

Determinism: merge ties break lexicographically (pair count desc,
pair asc), so the same corpus yields the same merges on any
partitioning — unit- and property-tested. No SQL oracle (iterative
merge training is not ANSI-expressible); the registered query is
rows-only and the semantics are pinned by hand-computed unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# The FROZEN v1 merge table (VERDICT r8 item 5). Production pipelines
# tokenize with a frozen tokenizer artifact — retraining per corpus
# makes token counts incomparable across corpus versions (and the
# registry query non-oracle-expressible). This list is the exact
# train_bpe(documents@sf0.01, n_merges=200) output — training converges
# at 106 merges, the fixture vocabulary is fully merged by then; the
# determinism of that derivation is pinned by
# tests/test_bpe.py::test_frozen_merges_match_trainer. Regenerate with:
#   python -c "from airflow_loan_etl_pipeline_spark.operators.bpe import
#              train_bpe; ..."  (train on /root/testdata/sf0.01)
FROZEN_MERGES_V1: tuple[tuple[str, str], ...] = (
    ('e', 'r'), ('e', '</w>'), ('n', '</w>'), ('er', '</w>'),
    ('o', 'w'), ('ow', '</w>'), ('o', 'r'), ('s', 't'),
    ('h', '</w>'), ('a', 't'), ('l', 'u'), ('i', 'n'),
    ('a', '</w>'), ('g', '</w>'), ('y', '</w>'), ('a', 'r'),
    ('p', 'ar'), ('t', '</w>'), ('i', 'n</w>'), ('j', 'o'),
    ('jo', 'in</w>'), ('a', 's'), ('as', 'h</w>'), ('h', 'ash</w>'),
    ('r', 'ow</w>'), ('at', 'c'), ('atc', 'h</w>'), ('b', 'atch</w>'),
    ('a', 'n</w>'), ('c', 'an</w>'), ('s', 'can</w>'), ('c', 'o'),
    ('c', 'u'), ('co', 'lu'), ('colu', 'm'), ('colum', 'n</w>'),
    ('cu', 'st'), ('cust', 'o'), ('custo', 'm'), ('custom', 'er</w>'),
    ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er</w>'),
    ('a', 'l'), ('al', 'l'), ('all', '</w>'), ('m', 'all</w>'),
    ('s', 'mall</w>'), ('er', 'g'), ('erg', 'e</w>'), ('l', 'ow</w>'),
    ('m', 'erge</w>'), ('s', 'low</w>'), ('c', 't'), ('ct', 'or'),
    ('ctor', '</w>'), ('d', 'er</w>'), ('e', 'ctor</w>'), ('or', 'der</w>'),
    ('v', 'ector</w>'), ('in', 'e</w>'), ('l', 'ine</w>'), ('a', 'b'),
    ('ab', 'l'), ('abl', 'e</w>'), ('at', 'a</w>'), ('d', 'ata</w>'),
    ('t', 'able</w>'), ('p', '</w>'), ('u', 'p</w>'), ('a', 'g'),
    ('ag', 'g</w>'), ('a', 'lu'), ('alu', 'e</w>'), ('v', 'alue</w>'),
    ('e', 'y</w>'), ('k', 'ey</w>'), ('a', 'm'), ('am', '</w>'),
    ('e', 'am</w>'), ('r', 'eam</w>'), ('st', 'ream</w>'), ('d', 'ow</w>'),
    ('in', 'dow</w>'), ('w', 'indow</w>'), ('k', '</w>'), ('par', 'k</w>'),
    ('s', 'park</w>'), ('g', 'r'), ('gr', 'o'), ('gro', 'up</w>'),
    ('par', 't</w>'), ('b', 'i'), ('bi', 'g</w>'), ('or', 't</w>'),
    ('s', 'ort</w>'), ('er', 'y</w>'), ('q', 'u'), ('qu', 'ery</w>'),
    ('a', 'st'), ('ast', '</w>'), ('f', 'ast</w>'), ('h', 'e</w>'),
    ('t', 'he</w>'), ('d', 'up</w>'),
)


def word_freq_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over the whitespace-tokenized corpus — the ONLY
    corpus-sized computation in BPE training."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_vocab_words: int = 100_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word-frequency
    table (characters + end-of-word marker as the base alphabet).
    Returns the ordered merge list — rank = list position."""
    rows = (
        word_freq_table(df, text_col)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_vocab_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        (*list(r["word"]), end_of_word): int(r["count"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        # deterministic: count desc, pair lexicographic asc
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], end_of_word: str
) -> list[str]:
    syms = [*list(word), end_of_word]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Per-document REAL BPE token counts under the trained merges:
    (id, n_words, n_bpe_tokens, bpe_per_word). One Arrow-batched scan;
    the merge ranks ride into the workers via closure (a few KB)."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def op(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            ids, nw, nt = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (t or "").split(" ") if w]
                total = 0
                for w in words:
                    n = cache.get(w)
                    if n is None:
                        n = len(_encode_word(w, ranks, end_of_word))
                        cache[w] = n
                    total += n
                ids.append(i)
                nw.append(len(words))
                nt.append(total)
            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_bpe_tokens": nt}
            )

    out = df.select(id_col, text_col).mapInPandas(
        op, schema=f"{id_col} long, n_words long, n_bpe_tokens long"
    )
    # Exact fixed-point ratio: (nt*10000) div nw is pure BIGINT math, so
    # the 4-decimal ratio is bit-identical on any engine — a float
    # round() here diverges from DuckDB's at representation boundaries
    # (the round-vs-floor gotcha class).
    return out.withColumn(
        "bpe_per_word",
        F.when(
            F.col("n_words") > 0,
            F.expr("(n_bpe_tokens * 10000) div n_words") / F.lit(1e4),
        ).otherwise(F.lit(0.0)),
    )
