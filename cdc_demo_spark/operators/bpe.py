"""Distributed BPE vocabulary training.

q_bpe_merge_candidates (queries/corpusops.py) is the inner loop of
byte-pair-encoding training; this module is the full trainer that
iterates it.  The scalable formulation is the standard one (Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016): BPE statistics are a function of the WORD-FREQUENCY
table, not the corpus — so the corpus is scanned exactly once
(word -> occurrence count), and every training iteration runs at
vocabulary grain.  At 100 TB the corpus is ~10^11 documents but the
distinct-word table is ~10^7-10^9 rows; iterating over the latter is
the difference between a tractable trainer and an untenable one.

Per iteration (all JVM-side, zero Python UDFs):
  1. pair counts: explode each word's adjacent symbol pairs weighted
     by word frequency, partial-aggregate map-side, shuffle only the
     pair-key space (bounded by the live vocabulary, never the corpus);
  2. argmax pair: count desc, then (left, right) lexicographic — the
     deterministic tie-break that makes training reproducible across
     runs, engines, and cluster sizes;
  3. merge application: a per-row ``F.aggregate`` fold over each
     word's symbol array (greedy non-overlapping left-to-right, the
     reference semantics).  No flag for "last element was just merged"
     is needed: after a merge the accumulator tail is left||right,
     which can never equal ``left`` again (right is non-empty), so the
     fold provably equals positional greedy matching.

The driver collects ONE row per iteration (the argmax pair) — the
vocabulary table itself never leaves the executors; lineage is cut
with localCheckpoint every iteration so the plan stays flat across
the merge loop (same pattern as operators/graph.pagerank).

Verified three ways: exact merge-list equality with a pure-Python
Sennrich-style reference (tests/test_bpe.py), an unrolled-SQL DuckDB
oracle replaying every iteration value-exactly (queries/textops.py::
q_bpe_train), and re-tokenization invariants (concat(tokens) == word,
token count shrinks by exactly the number of applied merges).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the ONE corpus scan.  freq counts occurrences
    (not documents); empty tokens from repeated separators drop."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(toks: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of one merge
    (left, right) -> left||right over a symbol array, as a fold."""
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), t)),
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, cnt) — adjacent-pair occurrences weighted by word
    frequency; overlapping occurrences count (reference semantics:
    [x,x,x] contributes (x,x) twice)."""
    pair_idx = F.sequence(F.lit(1), F.size("toks") - 1)
    return (
        words.filter(F.size("toks") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("left"),
                        F.element_at("toks", i + 1).alias("right"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").alias("cnt"))
    )


def auto_vocab_partitions(n_words: int, shuffle_partitions: int) -> int:
    """Partition count for a vocabulary-grain word table: one
    partition per ~50k words, clamped to [8, shuffle.partitions] —
    small vocabularies avoid per-task scheduling overhead in the
    merge loop, web-scale ones keep full parallelism (r12 ADVICE #4)."""
    return min(max(8, -(-int(n_words) // 50_000)), max(int(shuffle_partitions), 8))


def _train_bpe_driver(rows, n_merges: int) -> list[tuple[int, str, str, str, int]]:
    """Driver-side replica of the distributed merge loop over a
    collected (word, freq) table — bit-identical semantics: pair
    counts weight by word frequency and count OVERLAPPING occurrences
    ([x,x,x] contributes (x,x) twice — _pair_counts' reference
    semantics), the argmax tie-breaks (cnt desc, left asc, right asc)
    with Python's code-point string order == Spark's UTF8 binary order,
    and each merge applies greedy left-to-right NON-overlapping
    (_merge_fold's fold).  Early-stops when no pair remains.

    Pair counts are maintained INCREMENTALLY (r17 optimization round):
    the first cut re-counted every adjacency of every word per merge —
    O(n_merges x total symbol occurrences), the cost model the cap
    docstring warns about.  Each merge now touches only the words that
    CONTAIN the merged pair (tracked via a pair -> word-index posting
    map): their old adjacencies are subtracted, the merge applied, the
    new adjacencies added — exact integer bookkeeping, so every count
    (and therefore every argmax and tie-break) is identical to the
    full recount; zero-count pairs are dropped so the no-pair
    early-stop fires exactly as before.  Equality with the distributed
    loop stays pinned by test_train_bpe_distributed_path_equals_driver
    and the pure-Python reference test."""
    words = [(list(w), int(f)) for w, f in rows]
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for w_i, (toks, f) in enumerate(words):
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            counts[p] = counts.get(p, 0) + f
            where.setdefault(p, set()).add(w_i)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, cnt))
        pair = (left, right)
        for w_i in sorted(where.get(pair, ())):
            toks, f = words[w_i]
            out, j, changed = [], 0, False
            while j < len(toks):
                if (
                    j < len(toks) - 1
                    and toks[j] == left
                    and toks[j + 1] == right
                ):
                    out.append(left + right)
                    j += 2
                    changed = True
                else:
                    out.append(toks[j])
                    j += 1
            if not changed:
                # stale posting (an earlier merge of THIS round's loop
                # already rewrote the adjacency away)
                continue
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                c = counts[p] - f
                if c:
                    counts[p] = c
                else:
                    del counts[p]
                    where.pop(p, None)
            words[w_i] = (out, f)
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                counts[p] = counts.get(p, 0) + f
                where.setdefault(p, set()).add(w_i)
        where.pop(pair, None)
    return merges


def train_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 20,
    vocab_partitions: int | str | None = "auto",
    driver_vocab_cap: int = 500_000,
    word_freqs: DataFrame | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge table (rank, left, right, merged, cnt) — the
    artifact a tokenizer ships.  Stops early if the vocabulary runs
    out of pairs.  Symbols start as single characters (no end-of-word
    marker — merges apply within whitespace-delimited words; the
    marker variant is a trivial symbolization change).

    ``word_freqs`` lets a caller that already aggregated the corpus's
    (word, freq) table share it (r16 optimization round: build_corpus'
    token stage feeds the same table to training AND to the encoder's
    vocabulary, one corpus scan instead of three); must be exactly
    word_frequencies' output shape.

    ``vocab_partitions``: the word table is VOCABULARY-grain (~50k
    rows at the bench corpus), but it inherits the corpus aggregate's
    32 shuffle partitions — and the merge loop then runs n_merges
    small jobs whose per-task scheduling overhead dominates (r12
    measured 16.0 → 12.2 s at 30 merges from coalescing to 8, merge
    list bit-identical).  The default "auto" (r12 ADVICE #4: a fixed
    8 was a quiet scalability cliff for web-scale vocabularies using
    defaults) sizes from the materialized word-table count — one row
    per ~50k vocabulary words, clamped to [8, shuffle.partitions] —
    so a 100M-word vocabulary keeps full parallelism with no knob.
    An int pins the count; None keeps the upstream partitioning.
    The coalesce happens AFTER the eager checkpoint, so the
    word_frequencies aggregation itself writes at full parallelism
    (the other half of the same ADVICE item); coalesce on a
    checkpointed table is a narrow read-side fan-in, and the merge
    loop's re-checkpoints inherit the layout."""
    spark = docs.sparkSession
    wf = word_frequencies(docs, text_col) if word_freqs is None else word_freqs
    words = wf.select("word", "freq", F.split("word", "").alias("toks"))
    words = words.localCheckpoint(eager=True)
    n_vocab = words.count()
    # Driver path (r16 optimization round, same size-gated idiom as
    # graph.connected_components_star): training state is VOCABULARY
    # grain, and the distributed loop costs n_merges sequential argmax
    # jobs whose scheduler overhead dominates at any vocabulary that
    # fits the driver (the 200k bench corpus: ~50k words, 30 merges,
    # 11.0 s distributed vs ~3 s collected).  The replica's semantics
    # are bit-identical (see _train_bpe_driver); equality is pinned by
    # the existing oracle-backed BPE queries, the independent max-pair
    # gate in bench.time_bpe_train_200k, and the forced-distributed
    # equality test in tests/test_bpe.py (r16 ADVICE).  Above the cap
    # (web-scale vocabularies) the distributed loop runs unchanged —
    # the gating count is the count the auto-partition sizing already
    # ran.
    #
    # TUNABLE, with its cost model stated (r16 ADVICE): the driver
    # replica is O(n_merges x total symbol occurrences) pure Python
    # and holds the collected word table (~30 MB at the 500k default —
    # words are short).  The default cap is sized for short merge
    # lists (the repo's fixtures: <= 30 merges, where the replica wins
    # by >3x); at production merge counts (10k+) the Python loop's CPU
    # would dominate — lower driver_vocab_cap (or pass 0 to force the
    # distributed loop) when n_merges x vocabulary is large.  The cap
    # gates on the vocabulary count only because that is the number
    # already computed; callers own the n_merges dimension.
    if n_vocab <= int(driver_vocab_cap):
        merges = _train_bpe_driver(
            ((r["word"], r["freq"]) for r in words.select("word", "freq").collect()),
            n_merges,
        )
        return spark.createDataFrame(
            merges, "rank bigint, lhs string, rhs string, merged string, cnt bigint"
        )
    if vocab_partitions == "auto":
        upper = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        vocab_partitions = auto_vocab_partitions(n_vocab, upper)
    if vocab_partitions is not None:
        vocab_partitions = int(vocab_partitions)
        if vocab_partitions < words.rdd.getNumPartitions():
            # narrow fan-in over the checkpointed blocks; the merge
            # loop's own re-checkpoints persist this layout
            words = words.coalesce(vocab_partitions)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        # lazy checkpoint: the lineage cut registers now, the
        # materialization rides the NEXT iteration's argmax job — one
        # Spark job per merge instead of two
        words = words.select(
            "word", "freq", _merge_fold(F.col("toks"), left, right).alias("toks")
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank bigint, lhs string, rhs string, merged string, cnt bigint"
    )


def _priority_hazard(merges: list[tuple[str, str]]) -> bool:
    """True when priority (lowest-rank-present) encoding could diverge
    from the sequential fold reference: some merge's operand STRING is
    also the concatenation of a LATER merge.  Then a token of that
    string born via the later merge would trigger the earlier-ranked
    merge under priority order, which the sequential pass (already
    past that rank) never applies.  For lists without this shape the
    born-symbol argument holds exactly (a pair created by merge k
    contains a string first producible at rank k, so it can only match
    merges ranked after k).  O(n) driver-side check; hazard-bearing
    lists route to the per-word sequential encoder."""
    first_operand_use: dict[str, int] = {}
    for i, (left, right) in enumerate(merges):
        for s in (left, right):
            first_operand_use.setdefault(s, i)
    for k, (left, right) in enumerate(merges):
        j = first_operand_use.get(left + right)
        if j is not None and j < k:
            return True
    return False


def _priority_encoder(merges: list[tuple[str, str]]):
    """The per-word priority (lowest-rank-present) encode as a pure
    Python callable — shared by the Arrow rank encoder (encode_words
    impl='rank') and the driver-side word→ids replica
    (_word_id_rows_driver), so the two can never diverge.

    FIRST-occurrence-wins rank per pair (r13 ADVICE): a merge list
    may contain a duplicate pair, and in the fold reference the
    duplicate is a no-op for non-hazard lists — after the first
    (a,b) pass no new (a,b) adjacency can form unless some later
    merge BIRTHS an 'a' or 'b' token, which is exactly the operand
    shape _priority_hazard routes to the sequential replay.  A
    last-wins dict gave the duplicate's LATER rank priority and made
    e.g. [(a,b),(b,c),(a,b)] encode 'abc' to ['a','bc'] vs the
    fold's ['ab','c']."""
    ranks: dict[tuple[str, str], int] = {}
    for r, pair in enumerate(merges):
        ranks.setdefault(tuple(pair), r)
    merge_list = list(merges)
    hazard = _priority_hazard(merges)

    def _greedy_pass(toks: list[str], pair: tuple[str, str]) -> list[str]:
        out, j = [], 0
        while j < len(toks):  # merge ALL occurrences, greedy L2R
            if j < len(toks) - 1 and (toks[j], toks[j + 1]) == pair:
                out.append(toks[j] + toks[j + 1])
                j += 2
            else:
                out.append(toks[j])
                j += 1
        return out

    def _encode(word: str) -> list[str]:
        toks = list(word)
        if hazard:
            # the one shape where priority order can diverge from the
            # fold reference (_priority_hazard docstring): replay the
            # merge list sequentially per word — O(n_merges · len),
            # paid only for hazard-bearing lists
            for pair in merge_list:
                if len(toks) < 2:
                    break
                toks = _greedy_pass(toks, pair)
            return toks
        while len(toks) > 1:
            best_rank, best = None, None
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best = r, (toks[i], toks[i + 1])
            if best is None:
                break
            toks = _greedy_pass(toks, best)
        return toks

    return _encode


def encode_words(
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "toks",
    impl: str = "auto",
) -> DataFrame:
    """Encode a DISTINCT-WORD table through a learned merge list —
    the vocabulary-grain half of corpus tokenization (the same
    statistics argument as the trainer's module docstring: encoding
    work is a function of the vocabulary, not the corpus).

    Two implementations, equality pinned in tests/test_bpe.py:

    - ``impl="fold"``: chain one JVM ``_merge_fold`` rewrite per merge
      (plan depth ∝ n_merges; lineage cut every 4).  Right for short
      merge lists; at production sizes (10k-50k merges) Catalyst
      cannot even hold the chained plan.
    - ``impl="rank"``: Arrow-batched priority encoder — per word,
      repeatedly merge all occurrences of the lowest-ranked pair
      present (the subword-nmt/HF apply algorithm), O(len² + applied
      merges) per word INDEPENDENT of merge-list length.  Equals the
      sequential fold whenever no merge's operand string is also
      producible by a later merge (the born-symbol argument —
      ``_priority_hazard``); lists WITH that shape are detected
      driver-side in O(n) and routed to a per-word sequential replay
      inside the same Arrow UDF, so every merge list gets
      fold-identical tokens.
    - ``impl="auto"``: fold for <= 16 merges, rank past that.  The
      threshold is measured, not structural: at 200k docs / 50k
      distinct words / 30 merges the rank encoder wins 9.0 vs 13.1 s
      (the fold chain is an interpreted HOF per element, so it has no
      JVM-codegen edge to amortize), and its advantage only grows with
      merge count; short lists stay on the Python-free fold.
    """
    if impl == "auto":
        impl = "fold" if len(merges) <= 16 else "rank"
    if impl == "fold":
        enc = vocab.withColumn(out_col, F.split(F.col(word_col), ""))
        for i, (left, right) in enumerate(merges):
            enc = enc.withColumn(
                out_col, _merge_fold(F.col(out_col), left, right)
            )
            if (i + 1) % 4 == 0:  # bound expression-tree depth
                enc = enc.localCheckpoint(eager=False)
        return enc
    if impl != "rank":
        raise ValueError(f"unknown impl {impl!r}; expected 'fold', 'rank', 'auto'")
    import pandas as pd  # noqa: PLC0415 — worker-side import parity

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    _encode = _priority_encoder(merges)

    # no type hints: the module's `from __future__ import annotations`
    # stringifies them and pandas_udf cannot resolve the local pd alias
    @pandas_udf(ArrayType(StringType()))
    def enc_udf(words):
        return words.map(_encode)

    return vocab.withColumn(out_col, enc_udf(F.col(word_col)))


def bpe_tokenize(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "tokens",
    id_col: str | None = None,
    impl: str = "auto",
) -> DataFrame:
    """Apply a learned merge list (in rank order) to whitespace-split
    words of ``text_col``; emits ``out_col`` as array<string> of
    subword tokens in document order.

    With ``id_col`` (the 100 TB shape, r13): encode the DISTINCT
    vocabulary once (``encode_words``), then join the word→tokens
    table back to the exploded word positions and reassemble each
    document (array_sort over (pos, toks) structs — order restoration
    never relies on collect_list ordering).  ``id_col`` MUST be
    unique per row (r13 ADVICE): the positional regroup keys on it,
    so duplicate ids have their word positions merged and every
    duplicate row receives the combined token array — unlike the
    inline path, which tokenizes each row independently.  Callers
    with non-unique keys should pre-assign a surrogate (and pin it —
    ``monotonically_increasing_id`` is not stable across
    re-evaluations without a checkpoint, and checkpointing the full
    corpus frame is exactly the memory cost this path avoids).  Merge folds run once per
    distinct word instead of once per occurrence and the merge-list
    length stops constraining the corpus-side plan entirely.  The
    source is scanned three times (a slim explode→distinct for the
    vocabulary, the posexplode join probe, the final metadata rejoin)
    — scans are cheap next to per-occurrence merge folds, and pinning
    the 145M-row position table to avoid one scan would cost more
    storage traffic than the re-scan (measured shape at bench grain).

    Without ``id_col``: the original per-occurrence column algebra
    (one chained fold over every doc's word array) — no shuffle, fine
    for small frames and short merge lists, kept as the
    arbitrary-merge-list reference."""
    if id_col is None:
        toks_per_word = F.transform(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != ""),
            lambda w: F.split(w, ""),
        )
        out = df.withColumn(out_col, toks_per_word)
        for i, (left, right) in enumerate(merges):
            out = out.withColumn(
                out_col,
                F.transform(F.col(out_col), lambda toks: _merge_fold(toks, left, right)),
            )
            if (i + 1) % 4 == 0:  # bound expression-tree depth
                out = out.localCheckpoint(eager=False)
        return out.withColumn(out_col, F.flatten(F.col(out_col)))
    words = df.select(
        F.col(id_col).alias("_bpe_id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("_bpe_pos", "word"),
    )
    # vocabulary from its own slim subtree (explode, no positions/ids):
    # the distinct-word aggregate never carries the posexplode payload
    vocab = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("word")
    ).distinct()
    enc = encode_words(vocab, merges, impl=impl)
    per_doc = (
        words.join(enc, "word")  # AQE broadcasts a small vocabulary
        .groupBy("_bpe_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_bpe_pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias(out_col)
        )
    )
    joined = df.join(per_doc, F.col(id_col) == per_doc["_bpe_id"], "left")
    # docs with no words (empty/whitespace text) regroup to no row:
    # coalesce to the empty array the inline path produces
    return joined.drop("_bpe_id").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>"))
    )


def token_id_map(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(tok, tok_id) — the deterministic, engine-portable id scheme a
    shipped tokenizer uses: base characters first (every distinct
    character of the vocabulary, sorted, ids 0..C-1), then one id per
    DISTINCT merged string in first-occurrence merge order (C, C+1,
    ...).  Every token the encoder can emit is covered: a token is
    either an original character or was born by some merge, whose
    string is exactly that merge's left||right (the same born-symbol
    argument as _priority_hazard).  Merged strings are >= 2 codepoints
    so they never collide with the single-codepoint base rows; two
    merges producing the same string (e.g. (a,bc) and (ab,c)) share
    one id — the map is keyed by the token STRING, matching what the
    encoder emits.

    The base-character table is charset-sized (hundreds of rows, even
    for multilingual corpora), so its global row_number window is one
    tiny single-task sort; the merge rows are built driver-side from
    the merge list the caller already holds."""
    from pyspark.sql.window import Window

    spark = vocab.sparkSession
    chars = vocab.select(
        F.explode(F.split(F.col("word"), "")).alias("tok")
    ).filter(F.col("tok") != "").distinct()
    char_ids = chars.select(
        "tok",
        (F.row_number().over(Window.orderBy("tok")) - 1).cast("int").alias("tok_id"),
    )
    n_chars = char_ids.count()  # bounded: charset size
    merged_first: dict[str, int] = {}
    for left, right in merges:
        merged_first.setdefault(left + right, len(merged_first))
    merge_rows = [
        (tok, n_chars + idx) for tok, idx in merged_first.items()
    ]
    if not merge_rows:
        return char_ids
    merge_ids = spark.createDataFrame(merge_rows, "tok string, tok_id int")
    return char_ids.unionByName(merge_ids)


def _word_id_arrays(
    vocab: DataFrame, merges: list[tuple[str, str]], impl: str
) -> DataFrame:
    """(word, _ids array<int>) — the shared vocabulary-grain reassembly
    both encode entry points compose: encode each distinct word
    (``encode_words``), map every emitted token through
    ``token_id_map``, and restore subword order positionally (never
    via collect_list ordering).  The id-map join is INNER by
    construction (the map covers every emittable token; coverage
    pinned in tests/test_bpe.py).

    Pins the vocabulary (eager localCheckpoint — vocabulary-grain, the
    documented-safe class) BEFORE fanning out: token_id_map runs an
    eager charset count and both the encode and the id-map subtrees
    read the vocabulary again at execution, so an unpinned vocab would
    re-run its corpus-side explode→distinct three times (r14 review
    finding)."""
    vocab = vocab.localCheckpoint(eager=True)
    enc = encode_words(vocab, merges, impl=impl)
    idmap = token_id_map(vocab, merges)
    return (
        enc.select("word", F.posexplode("toks").alias("_tpos", "tok"))
        .join(idmap, "tok")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_tpos", "tok_id"))),
                lambda s: s["tok_id"],
            ).alias("_ids")
        )
    )


def encode_corpus_ids(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    key_cols: list[str],
    out_col: str = "token_ids",
    impl: str = "auto",
) -> DataFrame:
    """Model-ready token ids for a corpus frame: vocabulary-grain BPE
    encode (``encode_words`` — merge folds run once per DISTINCT word,
    never per occurrence) composed with the ``token_id_map`` id scheme
    and a positional per-key regroup.  Returns one row per input row:
    ``(*key_cols, out_col array<int>, n_words, n_bpe_tokens)`` where
    n_words counts the NON-EMPTY word occurrences encoded (empty
    tokens from repeated separators encode to nothing) and
    n_bpe_tokens = size(out_col).

    ``key_cols`` must be unique per row (the same positional-regroup
    contract as bpe_tokenize's id_col, composite keys allowed) and
    must not collide with the encoder's internal column names
    (``word``, ``_pos``, ``_ids``, ``n_words``, ``n_bpe_tokens``) or
    with ``out_col`` — e.g. key_cols=['word'] would make the
    posexplode select and the word→ids join ambiguous, so this is
    validated up front with a ValueError (ADVICE r14; mirrors
    build_corpus' doc_id-collision guard).  Rows whose text has no
    words come back with an empty array, not NULL.

    Scale shape: identical to bpe_tokenize with id_col — the corpus
    side is two slim scans (vocabulary explode→distinct, posexplode
    probe) plus the final metadata rejoin; everything merge-list-sized
    runs at vocabulary grain, and the word→ids / tok→id joins
    broadcast under AQE.  The id map join is INNER by construction
    (token_id_map covers every emittable token; coverage pinned in
    tests/test_bpe.py)."""
    reserved = {"word", "_pos", "_ids", "n_words", "n_bpe_tokens", out_col}
    bad = [c for c in key_cols if c in reserved]
    if bad:
        raise ValueError(
            f"key_cols {bad} collide with encode_corpus_ids internal/output "
            f"column names {sorted(reserved)}; rename the key column(s) "
            "before encoding (e.g. df.withColumnRenamed)"
        )
    nonempty = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    words = df.select(
        *key_cols, F.posexplode(nonempty).alias("_pos", "word")
    )
    vocab = df.select(F.explode(nonempty).alias("word")).distinct()
    word_ids = _word_id_arrays(vocab, merges, impl)
    per_key = (
        words.join(word_ids, "word")
        .groupBy(*key_cols)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_ids"))),
                    lambda s: s["_ids"],
                )
            ).alias(out_col),
            F.count(F.lit(1)).cast("long").alias("n_words"),
        )
    )
    joined = df.select(*key_cols).join(per_key, key_cols, "left")
    return joined.select(
        *key_cols,
        F.coalesce(F.col(out_col), F.array().cast("array<int>")).alias(out_col),
        F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
    ).withColumn("n_bpe_tokens", F.size(out_col).cast("long"))


def _word_id_rows_driver(
    words: list[str], merges: list[tuple[str, str]]
) -> list[tuple[str, list[int]]]:
    """(word, ids) for a collected vocabulary, built entirely on the
    driver — bit-identical to ``_word_id_arrays``: the same per-word
    priority encode (``_priority_encoder``, fold-equal via the hazard
    routing) and the same ``token_id_map`` id scheme (distinct
    characters sorted — Python code-point order == Spark UTF8 binary
    order, the ``_train_bpe_driver`` argument — then one id per
    distinct merged string in first-occurrence merge order).  Exists
    because deriving the ≤vocab-grain table distributed and collecting
    it costs a multi-job Spark chain (~6 s at the 200k fixture) where
    this is one vocabulary collect plus sub-second Python."""
    encode = _priority_encoder(merges)
    chars = sorted({c for w in words for c in w})
    tok_id = {c: i for i, c in enumerate(chars)}
    n_chars = len(tok_id)
    merged_first: dict[str, int] = {}
    for left, right in merges:
        merged_first.setdefault(left + right, len(merged_first))
    for tok, idx in merged_first.items():
        # merged strings are >= 2 codepoints so they never collide with
        # the single-codepoint base rows (token_id_map's argument)
        tok_id.setdefault(tok, n_chars + idx)
    return [(w, [tok_id[t] for t in encode(w)]) for w in words]


def _encode_chunked_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    word_rows: list,
) -> DataFrame:
    """Arrow regroup for the non-overlapping chunked encode (r17
    optimization round; guide §4.2/§8): the JVM path's slot posexplode
    → word→ids join → (id, chunk_id) collect_list exchange moves every
    slot struct through a full shuffle just to reassemble rows that
    were already doc-local.  Here the collected vocabulary-grain
    word→ids table (bounded: ``driver_vocab_cap`` gated by the caller,
    the same documented collect class as decode's literal map and the
    BPE driver trainer) is broadcast, and ONE mapInArrow pass computes
    every chunk row of a doc from the doc's own text — zero shuffle,
    zero joins, all per-batch work vectorized (pyarrow split/hash
    lookup + numpy offset arithmetic; no per-row Python).  Value
    parity with the JVM regroup — including empty slots, empty docs,
    out-of-vocabulary words (empty ids, still counted in n_words) and
    NULL text (no output rows) — is pinned by
    tests/test_bpe.py::test_encode_chunked_arrow_equals_jvm."""
    import numpy as np

    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StructField, StructType,
    )

    spark = df.sparkSession
    id_field = df.schema[id_col]
    words = [w for w, _ in word_rows]
    offs = np.zeros(len(words) + 1, dtype=np.int64)
    for i, (_, ids) in enumerate(word_rows):
        offs[i + 1] = offs[i] + len(ids)
    flat = np.empty(int(offs[-1]), dtype=np.int32)
    for i, (_, ids) in enumerate(word_rows):
        flat[offs[i]:offs[i + 1]] = ids
    bc = spark.sparkContext.broadcast((words, offs, flat))
    C = int(chunk_tokens)

    schema = StructType(
        [
            StructField(id_col, id_field.dataType, True),
            StructField("chunk_id", LongType(), False),
            StructField("n_tokens", LongType(), False),
            StructField("n_words", LongType(), False),
            StructField("n_bpe_tokens", LongType(), False),
            StructField("token_ids", ArrayType(IntegerType(), True), False),
        ]
    )

    def encode_batches(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        words, offs, flat = bc.value
        vocab_arr = pa.array(words, type=pa.string())
        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column(1)
            if texts.null_count:
                # split(NULL) posexplodes to no rows on the JVM path:
                # NULL-text docs produce no output rows
                keep = pc.is_valid(texts)
                batch = batch.filter(keep)
                if batch.num_rows == 0:
                    continue
                texts = batch.column(1)
            lst = pc.split_pattern(texts, " ")
            slot_off = lst.offsets.to_numpy().astype(np.int64)
            slot_off = slot_off - slot_off[0]
            slots = lst.flatten()
            n_docs = batch.num_rows
            n_slots = np.diff(slot_off)              # >= 1 per doc
            total_slots = int(slot_off[-1])
            idx = pc.index_in(slots, value_set=vocab_arr).fill_null(-1)
            idx = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            hit = idx >= 0
            nonempty = pc.not_equal(slots, "").to_numpy(zero_copy_only=False)
            cnt = np.where(hit, offs[idx + 1] - offs[idx], 0)
            csum = np.concatenate(([0], np.cumsum(cnt)))
            # gather the flat id stream in slot order
            src_start = np.where(hit, offs[idx], 0)
            total_ids = int(csum[-1])
            gidx = (
                np.repeat(src_start - csum[:-1], cnt)
                + np.arange(total_ids, dtype=np.int64)
            )
            tok_flat = flat[gidx]
            # chunk tiling: chunk j of doc d covers slots
            # [doc_start + j*C, min(doc_start + (j+1)*C, doc_end))
            n_chunks = (n_slots + C - 1) // C         # n_slots >= 1
            total_chunks = int(n_chunks.sum())
            chunk_doc = np.repeat(np.arange(n_docs), n_chunks)
            chunk_off = np.concatenate(([0], np.cumsum(n_chunks)))
            chunk_id = (
                np.arange(total_chunks, dtype=np.int64)
                - np.repeat(chunk_off[:-1], n_chunks)
            )
            starts = slot_off[chunk_doc] + chunk_id * C
            ends = np.minimum(starts + C, slot_off[chunk_doc + 1])
            n_tokens = ends - starts
            # chunks tile the slot array in order, so per-chunk sums
            # are reduceat segments at the chunk starts
            n_words = np.add.reduceat(nonempty.astype(np.int64), starts)
            n_bpe = np.add.reduceat(cnt, starts) if total_ids else np.zeros(
                total_chunks, dtype=np.int64
            )
            list_off = csum[np.concatenate((starts, [total_slots]))]
            ids_arr = pa.ListArray.from_arrays(
                pa.array(list_off, type=pa.int32()),
                pa.array(tok_flat, type=pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(batch.column(0), pa.array(chunk_doc)),
                    pa.array(chunk_id, type=pa.int64()),
                    pa.array(n_tokens, type=pa.int64()),
                    pa.array(n_words, type=pa.int64()),
                    pa.array(n_bpe, type=pa.int64()),
                    ids_arr,
                ],
                names=[
                    id_col, "chunk_id", "n_tokens", "n_words",
                    "n_bpe_tokens", "token_ids",
                ],
            )

    return df.select(id_col, text_col).mapInArrow(encode_batches, schema)


def encode_chunked_corpus_ids(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str,
    chunk_tokens: int,
    stride: int | None = None,
    impl: str = "auto",
    vocab: DataFrame | None = None,
    regroup: str = "auto",
    driver_vocab_cap: int = 500_000,
) -> DataFrame:
    """Token ids for every CHUNK of every document — the corpus
    pipeline's scale path (operators/corpus_pipeline.build_corpus with
    bpe_merges).  Returns (id_col, chunk_id, n_tokens, n_words,
    n_bpe_tokens, token_ids array<int>), one row per chunk, with chunk
    boundaries EXACTLY chunk_documents' (the shared
    operators/chunking.chunk_starts formula).

    Why not chunk first and encode chunk rows?  BPE merges never cross
    word boundaries and chunks split on word boundaries, so a chunk's
    id stream is a word-aligned SLICE of its document's per-word id
    arrays.  Encoding at document grain and slicing arrays:

    - touches the corpus text exactly TWICE (the slot posexplode and
      one slim vocabulary explode→distinct, which _word_id_arrays pins
      before the id-table fan-out) instead of re-deriving chunk text
      for each of the encoder's scans — chunk text is never
      materialized at all, which also means overlapping strides
      duplicate nothing;
    - regroups 1 row per document, not per chunk, and the chunk
      explode afterwards is zero-shuffle codegen (measured 41.2 s →
      see SCALE.md r14 for the composed-stage number this replaced).

    EMPTY slots (runs of separators) are kept through the regroup with
    empty id arrays so chunk boundaries and the slot census (n_tokens)
    match chunk_documents on any input; n_words counts the non-empty
    slots actually encoded.

    ``regroup`` (r17 optimization round) picks the physical regroup for
    the non-overlapping case: ``'auto'`` (default) runs the zero-shuffle
    broadcast-dict Arrow pass (``_encode_chunked_arrow``) whenever
    stride == chunk_tokens AND the vocabulary fits
    ``driver_vocab_cap`` (the documented bounded-collect class; same
    default as train_bpe's driver gate), else the JVM join+regroup;
    ``'jvm'`` forces the join+regroup; ``'arrow'`` forces the Arrow
    pass (raises above the cap or with overlapping strides — a slot
    belongs to several chunks there, which only the JVM doc-grain
    slice path handles).  Both regroups are value-identical
    (tests/test_bpe.py::test_encode_chunked_arrow_equals_jvm)."""
    if stride is None:
        stride = chunk_tokens
    if regroup not in ("auto", "arrow", "jvm"):
        raise ValueError(
            f"unknown regroup {regroup!r}; expected 'auto', 'arrow', 'jvm'"
        )
    if regroup == "arrow" and stride != chunk_tokens:
        raise ValueError(
            "regroup='arrow' requires stride == chunk_tokens (overlapping "
            "windows share slots across chunks; use the JVM path)"
        )
    from cdc_demo_spark.operators.chunking import chunk_starts

    slots = F.split(F.col(text_col), " ")
    if vocab is None:
        vocab = (
            df.select(F.explode(slots).alias("word"))
            .filter(F.col("word") != "")
            .distinct()
        )
    else:
        # caller-supplied vocabulary (r16 optimization round): a
        # word-frequency table the token stage already aggregated —
        # MUST cover exactly the corpus's distinct non-empty words
        # (build_corpus passes word_frequencies of the same frame);
        # skips this function's own corpus explode→distinct scan
        vocab = vocab.select("word")
    # Arrow regroup (r17 optimization round): with non-overlapping
    # windows and a vocabulary that fits the driver (the documented
    # bounded-collect class — same cap default as train_bpe's driver
    # gate), the whole encode is one broadcast-dict mapInArrow pass
    # over the corpus: zero shuffle, zero joins (see
    # _encode_chunked_arrow).  Above the cap, or with overlapping
    # strides, the JVM join+regroup below runs unchanged.
    if regroup != "jvm" and stride == chunk_tokens:
        vocab = vocab.localCheckpoint(eager=True)
        n_vocab = vocab.count()
        if n_vocab <= int(driver_vocab_cap):
            word_rows = _word_id_rows_driver(
                [r["word"] for r in vocab.collect()], merges
            )
            return _encode_chunked_arrow(
                df, text_col, id_col, chunk_tokens, word_rows
            )
        if regroup == "arrow":
            raise ValueError(
                f"regroup='arrow': vocabulary has {n_vocab} words > "
                f"driver_vocab_cap={driver_vocab_cap}; use regroup='jvm'"
            )
    occ = df.select(
        F.col(id_col), F.posexplode(slots).alias("_pos", "word")
    )
    word_ids = _word_id_arrays(vocab, merges, impl)
    # left join: empty slots (and only those — token_id_map covers
    # every emittable token) miss and carry an empty id array
    slot = occ.join(word_ids, "word", "left").select(
        id_col,
        F.col("_pos"),
        F.struct(
            F.col("_pos"),
            F.coalesce(F.col("_ids"), F.array().cast("array<int>")).alias("_ids"),
            (F.col("word") != "").alias("_ne"),
        ).alias("s"),
    )
    if stride == chunk_tokens:
        # Non-overlapping windows partition the slot sequence, so the
        # regroup can key directly on (id, chunk_id) — same shuffled
        # rows, but groups are chunk-sized (≤ chunk_tokens structs to
        # sort) instead of document-sized, and the per-doc chunk
        # re-slice transform disappears (r16 optimization round:
        # 9.8 → 7.6 s steady at the 200k fixture, output
        # row/value-identical — every doc has ≥ 1 slot, so chunk 0
        # always exists and slot counts reproduce chunk_starts'
        # n_tokens exactly).  Overlapping strides keep the doc-grain
        # slice path below (a slot belongs to several chunks there).
        per_chunk = (
            slot.select(
                id_col,
                (F.col("_pos") / chunk_tokens).cast("long").alias("chunk_id"),
                "s",
            )
            .groupBy(id_col, "chunk_id")
            .agg(F.array_sort(F.collect_list("s")).alias("_arr"))
        )
        carr = F.col("_arr")
        ids_flat = F.flatten(F.transform(carr, lambda x: x["_ids"]))
        return per_chunk.select(
            id_col,
            "chunk_id",
            F.size(carr).cast("long").alias("n_tokens"),
            F.aggregate(
                carr, F.lit(0).cast("long"),
                lambda acc, x: acc + x["_ne"].cast("long"),
            ).alias("n_words"),
            F.size(ids_flat).cast("long").alias("n_bpe_tokens"),
            ids_flat.alias("token_ids"),
        )
    per_doc = (
        slot.select(id_col, "s")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("s")).alias("_arr"))
    )
    arr = F.col("_arr")
    n = F.size(arr)
    chunks = F.transform(
        chunk_starts(n, chunk_tokens, stride),
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.least(n - s, F.lit(chunk_tokens)).cast("long").alias("n_tokens"),
            F.aggregate(
                F.slice(arr, s + 1, chunk_tokens),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x["_ne"].cast("long"),
            ).alias("n_words"),
            F.flatten(
                F.transform(F.slice(arr, s + 1, chunk_tokens), lambda x: x["_ids"])
            ).alias("token_ids"),
        ),
    )
    return per_doc.select(id_col, F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.n_words").alias("n_words"),
        F.size("c.token_ids").cast("long").alias("n_bpe_tokens"),
        F.col("c.token_ids").alias("token_ids"),
    )


def decode_corpus_ids(
    df: DataFrame,
    ids_col: str,
    idmap: DataFrame,
    key_cols: list[str] | None = None,
    out_col: str = "decoded",
    impl: str = "auto",
    max_literal_vocab: int = 65536,
) -> DataFrame:
    """Inverse of ``encode_corpus_ids`` at the id level: map each row's
    ``ids_col`` (array<int>) back through the ``token_id_map`` table
    and concatenate the token strings in order.  This is the detok
    half a trainer needs for spot-reading batches and for loss-string
    debugging; because merges never cross word boundaries and the
    symbolization carries no word marker, the decoded string is the
    document's text with the inter-word spaces removed — the
    round-trip invariant ``q_bpe_decode`` pins value-exactly.

    Adds ``out_col`` (string, '' for empty/NULL id arrays) and
    ``n_unknown_ids`` (long): ids absent from the map decode to
    nothing but are COUNTED, so a vocabulary/corpus mismatch is
    visible in the output instead of silently dropped.

    Two physical strategies:

    - ``impl='literal'`` (chosen by ``'auto'`` when the map has at
      most ``max_literal_vocab`` rows — every shipped-tokenizer-sized
      vocabulary): collect the map once (vocabulary-grain, the
      documented-bounded class), verify ids are dense 0..V-1 (true by
      ``token_id_map`` construction), and decode as a pure per-row
      projection ``element_at(<array literal>, id+1)`` — ZERO
      shuffle, zero joins; the array ships as one plan literal, not
      V codegen expressions.
    - ``impl='join'`` (the arbitrarily-large-vocabulary path; needs
      ``key_cols``, same uniqueness + reserved-name contract as
      ``encode_corpus_ids``): posexplode ids, broadcast-join the map
      on tok_id, regroup positionally per key.  One shuffle at
      corpus-token grain — the unavoidable cost once the map itself
      is too big to ship to every task.

    Both implementations are pinned equal in tests/test_bpe.py."""
    if impl == "auto":
        impl = "literal" if idmap.count() <= max_literal_vocab else "join"
    if impl == "literal":
        rows = idmap.collect()
        if len(rows) > max_literal_vocab:
            raise ValueError(
                f"decode_corpus_ids: id map has {len(rows)} rows > "
                f"max_literal_vocab={max_literal_vocab}; use impl='join'"
            )
        by_id = {int(r["tok_id"]): r["tok"] for r in rows}
        if sorted(by_id) != list(range(len(rows))):
            raise ValueError(
                "decode_corpus_ids: id map ids are not dense 0..V-1 "
                "(duplicate or gapped tok_id) — not a token_id_map artifact"
            )
        arr = F.lit([by_id[i] for i in range(len(rows))])
        ids = F.coalesce(F.col(ids_col), F.array().cast("array<int>"))
        # try_element_at: unknown ids (out of 0..V-1) must map to NULL
        # and be counted, not raise under ANSI mode.  The sign guard
        # matters: try_element_at(-k) indexes from the END of the
        # array, so a negative id would silently decode to a real
        # token instead of counting as unknown.
        mapped = F.transform(
            ids, lambda i: F.when(i >= 0, F.try_element_at(arr, i + 1))
        )
        return df.withColumn(
            out_col, F.concat_ws("", F.filter(mapped, lambda t: t.isNotNull()))
        ).withColumn(
            "n_unknown_ids",
            (F.size(ids) - F.size(F.filter(mapped, lambda t: t.isNotNull())))
            .cast("long"),
        )
    if impl != "join":
        raise ValueError(f"decode_corpus_ids: unknown impl {impl!r}")
    if not key_cols:
        raise ValueError("decode_corpus_ids: impl='join' requires key_cols")
    reserved = {"tok", "tok_id", "_pos", out_col, "n_unknown_ids", ids_col}
    bad = [c for c in key_cols if c in reserved]
    if bad:
        raise ValueError(
            f"key_cols {bad} collide with decode_corpus_ids internal/output "
            f"column names {sorted(reserved)}; rename before decoding"
        )
    ids = F.coalesce(F.col(ids_col), F.array().cast("array<int>"))
    ex = df.select(*key_cols, F.posexplode(ids).alias("_pos", "tok_id"))
    per_key = (
        ex.join(F.broadcast(idmap), "tok_id", "left")
        .groupBy(*key_cols)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("_pos", F.coalesce("tok", F.lit(None)).alias("tok"))
                        )
                    ),
                    lambda s: s["tok"],
                ),
            ).alias(out_col),
            F.sum(F.col("tok").isNull().cast("long")).alias("n_unknown_ids"),
        )
    )
    joined = df.join(per_key, key_cols, "left")
    return joined.withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(""))
    ).withColumn(
        "n_unknown_ids", F.coalesce(F.col("n_unknown_ids"), F.lit(0)).cast("long")
    )
