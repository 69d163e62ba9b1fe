"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema matches the BASELINE input hint exactly:
    (repo string, path string, commit string, lang string, content string)

Every row is a pure function of (seed, row index i) via a counter-based
Philox stream, so the corpus is identical regardless of Spark parallelism
or batching — required for the differential control-vs-distributed tests
(the reference's BaseDistributedSearchTestCase pattern,
solr/test-framework/src/java/org/apache/solr/BaseDistributedSearchTestCase.java:644-656).

Content is Zipf-distributed draws from a ~5k-term code vocabulary
(keywords, camelCase, snake_case, numerals) with planted rare terms
(`zzfrobnicate`, `qqxylophone7`) and hot terms (`the`, `license`, `int`)
to exercise stop filtering, skew salting and block-max pruning.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd

SEED = 42
RARE1, RARE2 = "zzfrobnicate", "qqxylophone7"

_LANGS = ["java", "py", "js", "go", "c", "md", "xml"]
_LANG_CDF = np.cumsum([0.30, 0.20, 0.15, 0.10, 0.10, 0.10, 0.05])
_EXT = {"java": "java", "py": "py", "js": "js", "go": "go", "c": "c", "md": "md", "xml": "xml"}

_KEYWORDS = (
    "the license int public static void class def return import if else for "
    "while break continue new delete try catch finally throw func var let "
    "const type struct interface package module export async await yield "
    "lambda None null nil true false this self super extends implements "
    "abstract final switch case default do goto sizeof typedef enum union "
    "volatile register extern unsigned signed long short double float char "
    "bool string printf println print len range append push pop shift map "
    "filter reduce sort copy move swap begin end size empty clear insert "
    "erase find count begin_t apache version copyright contributor"
).split()

_VERBS = "get set make build parse read write init create update delete find load save open close run test check send".split()
_NOUNS = "Foo Bar Baz Value Index Token Query Result Buffer Stream Node Tree List Map Count Hash Block Term Doc Score".split()
_SUFFIX = ["", "s", "Impl", "Helper", "Factory", "0", "1"]
_SNAKE_A = "max min num tmp src dst len idx buf ptr".split()
_SNAKE_B = "size count offset limit value index bytes items rows cols".split()


@lru_cache(maxsize=1)
def build_vocab() -> tuple[np.ndarray, np.ndarray]:
    """Returns (vocab array[str], zipf CDF). Deterministic."""
    vocab: list[str] = []
    vocab += _KEYWORDS
    vocab += [f"{v}{n}{s}" for v in _VERBS for n in _NOUNS for s in _SUFFIX]
    vocab += [f"{a}_{b}" for a in _SNAKE_A for b in _SNAKE_B]
    vocab += [f"{a}_{b}_{k}" for a in _SNAKE_A for b in _SNAKE_B for k in range(3)]
    vocab += [str(k) for k in range(100)]
    vocab += [str(1 << k) for k in range(7, 21)]
    # planted rares live at the Zipf tail
    vocab += [RARE1, RARE2]
    arr = np.array(vocab, dtype=object)
    ranks = np.arange(1, len(arr) + 1, dtype=np.float64)
    w = 1.0 / ranks**1.07
    cdf = np.cumsum(w) / w.sum()
    return arr, cdf


def _gen_row(i: int, vocab: np.ndarray, cdf: np.ndarray, seed: int) -> tuple[str, str, str, str, str]:
    rng = np.random.Generator(np.random.Philox(counter=i, key=seed))
    u = rng.random(3)
    doclen = 20 + int(1980.0 * u[0] ** 3)  # skew short; mean ~515
    idx = np.searchsorted(cdf, rng.random(doclen))
    toks = vocab[idx].tolist()
    if i % 997 == 3:
        toks.append(RARE1)
    if i % 1013 == 11:
        toks.append(RARE2)
    lang = _LANGS[int(np.searchsorted(_LANG_CDF, u[1]))]
    repo = f"org{i % 7}/repo{i % 23}"
    path = f"src/d{(i // 23) % 17}/f{i}.{_EXT[lang]}"
    commit = hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40]
    return repo, path, commit, lang, " ".join(toks)


def corpus_pandas(start: int, end: int, seed: int = SEED) -> pd.DataFrame:
    """Rows [start, end) as a pandas DataFrame (used by tests + mapInPandas)."""
    vocab, cdf = build_vocab()
    rows = [_gen_row(i, vocab, cdf, seed) for i in range(start, end)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def corpus_df(spark, n_docs: int, seed: int = SEED, num_partitions: int | None = None):
    """Distributed corpus as a Spark DataFrame (generated, nothing external)."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab, cdf = build_vocab()
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [_gen_row(int(i), vocab, cdf, seed) for i in ids]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_docs, numPartitions=num_partitions).mapInPandas(gen, CORPUS_SCHEMA)


def materialize_corpus(spark, n_docs: int, out_path: str, seed: int = SEED,
                       num_partitions: int | None = None) -> str:
    """Generate once and persist to parquet (bench reads this, so corpus
    generation time never pollutes indexing-throughput numbers)."""
    corpus_df(spark, n_docs, seed, num_partitions).write.mode("overwrite").parquet(out_path)
    return out_path
