"""Pipeline façade — flod's UFCS chaining surface on top of DataFrames.

flod composes ``read("f.txt").byLine.map(...).take(n).write("g.txt")`` where
the Schema expression-template defers instantiation until a terminal sink
(pipeline.d:455-464; README.md:10-14). Here the DataFrame chain *is* the
deferred plan (Catalyst = flod's compile-time negotiation, SURVEY.md §0),
and terminal sinks trigger actions.

Sources  (SURVEY §2.1): read_parquet/read_text (S1 read/FileReader file.d:14-34),
    from_array (S2 ArraySource range.d:25-45), from_range (S3 range.d:58-87),
    from_generator (S4 DelegateSource range.d:169-189), Queue (S5 range.d:211-237).
Filters  (SURVEY §2.2): take (F1 package.d:114-199), by_line (F2 Splitter
    range.d:359-515), by_chunk (F3/F4 range.d:549-624), map_batches (the
    peek/consume loop as mapInPandas), adapters (F6-F17 adapter.d:12-580 —
    physical no-ops here; exposed as repartition hints).
Sinks    (SURVEY §2.3): write_* (K1 file.d:36-67), discard (K2 package.d:43-66),
    to_array (K3 package.d:69-112), copy_to (K4 range.d:133-167),
    __iter__ (K5 / entry point B pipeline.d:467-470).
Tags     (SURVEY §1.4, metadata.d): set_tag/get_tag with nearest-upstream-setter
    resolution; on_change callbacks fire when a tag is re-set downstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from flod_spark.seq import SEQ, take_by_seq, with_seq

VALUE = "value"


class Pipeline:
    """A lazily-built stream: wraps a DataFrame + the ordered-stream ``seq``
    convention + flod-style tag metadata. All transforms return new Pipelines
    (immutable, like Schema.pipe pipeline.d:455-464)."""

    def __init__(self, df: DataFrame, ordered: bool = False, tags: dict[str, list[Any]] | None = None):
        self.df = df
        self.ordered = ordered  # True iff a valid `seq` column is present
        self._tags = tags or {}

    # ---- internal -------------------------------------------------------
    def _derive(self, df: DataFrame, ordered: bool | None = None) -> "Pipeline":
        p = Pipeline(df, self.ordered if ordered is None else ordered, dict(self._tags))
        # onChange listeners survive transforms (pipeline.d:251-262: the hook
        # is part of the pipeline's metadata chain, not of one stage).
        listeners = getattr(self, "_listeners", None)
        if listeners:
            p._listeners = {k: list(v) for k, v in listeners.items()}
        return p

    def _require_seq(self) -> None:
        if not self.ordered:
            raise ValueError(
                "order-sensitive operator on unordered stream: call .ordered_by(*cols) first "
                "(SURVEY.md §4.2-1 — Spark is unordered; flod order must be explicit)"
            )

    # ---- ordering -------------------------------------------------------
    def ordered_by(self, *cols: str) -> "Pipeline":
        """Establish the stream order: adds gap-free ``seq`` (see seq.py)."""
        return self._derive(with_seq(self.df, *cols), ordered=True)

    # ---- filters (SURVEY §2.2) -----------------------------------------
    def take(self, n: int) -> "Pipeline":
        """flod take(n) package.d:114-199: first n elements of the stream.
        Catalyst pushes the equivalent limit into scans where order is not
        established; with seq it is a pushdown-friendly range filter."""
        if self.ordered:
            return self._derive(take_by_seq(self.df, n))
        return self._derive(self.df.limit(n))

    def map(self, colfn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        """Whole-DataFrame transform escape hatch (stays declarative)."""
        return self._derive(colfn(self.df))

    def map_values(self, expr) -> "Pipeline":
        """Per-element transform of the `value` column (JVM expression —
        the fast path; flod's map!fun stage)."""
        return self._derive(self.df.withColumn(VALUE, expr))

    def by_line(self, sep: str = "\n", keep_terminator: bool = False) -> "Pipeline":
        """flod byLine/Splitter range.d:359-515 over a string `value` column.

        Splits each value into lines; final unterminated line kept
        (range.d:407-419). keep_terminator re-appends `sep` to all but an
        unterminated final line (range.d:445-451). Emits ordered (parent_seq,
        line_no) when the stream is ordered.
        """
        df = self.df
        # flod's Splitter takes a LITERAL terminator (any string, incl.
        # multi-char, range.d:359-515); F.split expects a Java regex, so
        # quote it (\Q...\E = Pattern.quote semantics). \E inside the
        # separator would close the quote early — re-open around it.
        quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
        parts = F.split(F.col(VALUE), F.lit(quoted).cast("string"), -1)
        # split('a\nb\n') -> ['a','b',''] ; trailing '' means terminated end.
        exploded = df.select(
            *[c for c in df.columns if c != VALUE],
            F.posexplode(parts).alias("_pos", "_line"),
            F.size(parts).alias("_n"),
        )
        # drop the trailing empty marker row, remember it was terminated
        terminated = (F.col("_pos") < F.col("_n") - 1) | (F.col("_line") != F.lit(""))
        kept = exploded.filter(terminated)
        line = F.col("_line")
        if keep_terminator:
            line = F.when(F.col("_pos") < F.col("_n") - 1, F.concat(F.col("_line"), F.lit(sep))).otherwise(
                F.col("_line")
            )
        out = kept.withColumn(VALUE, line).withColumn("line_no", F.col("_pos") + 1).drop("_pos", "_line", "_n")
        if self.ordered:
            out = with_seq(out.withColumnRenamed(SEQ, "_parent_seq"), "_parent_seq", "line_no").drop("_parent_seq")
        return self._derive(out)

    def by_chunk(self, size: int) -> "Pipeline":
        """flod byChunk range.d:549-624: regroup the ordered stream into
        fixed-size chunks (last partial). chunk id = seq div size."""
        self._require_seq()
        return self._derive(
            self.df.withColumn("chunk_id", F.expr(f"{SEQ} div {int(size)}"))
        )

    def by_chunk_arrays(self, size: int) -> "Pipeline":
        """flod byChunk's TRUE element type: each chunk becomes ONE element
        whose value is the array of its members in stream order
        (range.d:549-581 — the stream's element type changes from E to
        E[]). seq becomes the chunk index. Scale: one hash exchange on
        chunk_id; each group is `size` elements, so memory per group is
        bounded by construction."""
        self._require_seq()
        chunked = self.df.withColumn("chunk_id", F.expr(f"{SEQ} div {int(size)}"))
        gathered = (
            chunked.groupBy("chunk_id")
            .agg(
                F.array_sort(F.collect_list(F.struct(SEQ, VALUE))).getField(VALUE).alias(VALUE)
            )
            .withColumnRenamed("chunk_id", SEQ)
        )
        return self._derive(gathered)

    def map_batches(self, fn, schema) -> "Pipeline":
        """Chunk-wise user stage = mapInPandas — the Arrow-batched analog of
        flod's peek/consume loop (SURVEY §4.1 'zero-copy peek path'). `fn`
        is an iterator-of-pandas-batches transformer."""
        return self._derive(self.df.mapInPandas(fn, schema=schema), ordered=False)

    def repartition_hint(self, n: int | None = None, *cols: str) -> "Pipeline":
        """Adapters F6-F17 (adapter.d:12-580) are identity on data — flod's
        physical glue. The Spark-visible analog is an exchange hint."""
        if n is None:
            return self._derive(self.df.coalesce(1))
        return self._derive(self.df.repartition(n, *cols) if cols else self.df.repartition(n))

    # ---- tags (metadata.d; SURVEY §1.4) --------------------------------
    def set_tag(self, key: str, value: Any) -> "Pipeline":
        """@tagSetter metadata.d:38-41 — value visible to downstream getters;
        nearest-upstream-setter wins (metadata.d:256-264). Writes through
        to the ENGINE layer (StructField metadata, flod_spark.tags) so the
        tag survives hand-off to plain-DataFrame code, parquet round-trips,
        and Pipelines reconstructed from a bare df; the driver-side dict
        keeps flod's synchronous onChange semantics (and the EXACT Python
        object — the engine layer stores the JSON image, so a tuple reads
        back as a list there). Values the engine layer cannot serialize
        (arbitrary objects) stay driver-side only, like flod's in-process
        tags."""
        from flod_spark import tags as engine_tags

        try:
            df = engine_tags.set_tag(self.df, key, value)
        except TypeError:  # non-JSON-serializable value: driver-side only
            df = self.df
        p = self._derive(df)
        p._tags = {**self._tags, key: self._tags.get(key, []) + [value]}
        for cb in getattr(self, "_listeners", {}).get(key, []):
            cb(value)
        return p

    def get_tag(self, key: str) -> Any:
        """@tagGetter — reads the nearest upstream setter's value (falls
        back to StructField metadata when this Pipeline was built from a
        DataFrame whose plan already carries engine-layer tags)."""
        vals = self._tags.get(key)
        if vals:
            return vals[-1]
        from flod_spark import tags as engine_tags

        return engine_tags.get_tag(self.df, key)

    def on_change(self, key: str, cb: Callable[[Any], None]) -> "Pipeline":
        """onChange!key hook (pipeline.d:251-262): fires when the tag is set."""
        listeners = dict(getattr(self, "_listeners", {}))
        listeners[key] = listeners.get(key, []) + [cb]
        p = self._derive(self.df)
        p._listeners = listeners
        return p

    def tag_as_column(self, key: str, col: str | None = None) -> "Pipeline":
        """Materialize the nearest-upstream-setter tag as PER-ROW DATA
        (column ``tag_<key>`` by default) — the SURVEY §1.5 sub-batch
        workaround, now a tested API (r10 verdict item 9): flod fires
        onChange per setter write in element order, while the Spark
        observe() bridge coalesces transitions to one delivery per
        micro-batch. A consumer that needs every transition turns the
        tag into data HERE, at the point whose upstream setter it wants:
        each segment's rows carry that segment's value, so a union of
        differently-tagged segments shows every transition within one
        batch, row-accurate (tests/test_tags_engine.py pins this
        against the coalescing listener). Non-literal tag values (dicts,
        tuples) materialize as their JSON image — the engine layer's
        serialized form.

        Scale: a literal column — zero compute, zero shuffle; it prunes
        away unless projected."""
        import json as _json

        val = self.get_tag(key)
        name = col or f"tag_{key}"
        # scalar -> literal column; anything structured -> JSON image
        # (F.lit(dict) only fails JVM-side at withColumn, so the type
        # check must be explicit, not try/except)
        if val is None or isinstance(val, (str, int, float, bool, bytes)):
            c = F.lit(val)
        else:
            c = F.lit(_json.dumps(val, sort_keys=True))
        return self._derive(self.df.withColumn(name, c))

    def observe(self, name: str, **aggs) -> tuple["Pipeline", Any]:
        """Dynamic per-run tags (SURVEY §1.5): attach named aggregate
        observations; after any action on this pipeline, ``observation.get``
        holds the {tag: value} dict (flod's runtime tag publication —
        values that exist only once data flows). Engine layer:
        flod_spark.tags.observe_tags."""
        from flod_spark import tags as engine_tags

        df, obs = engine_tags.observe_tags(self.df, name, **aggs)
        return self._derive(df), obs

    # ---- training-data ops (extension mandate, chainable) --------------
    def _reseq(self, df: DataFrame) -> "Pipeline":
        """Re-establish the gap-free seq invariant after a row filter on an
        ordered stream (same pattern as by_line): downstream seq-keyed
        operators (take, by_chunk) assume seq == rank 0..n-1."""
        out = with_seq(df.withColumnRenamed(SEQ, "_parent_seq"), "_parent_seq").drop("_parent_seq")
        return self._derive(out, ordered=True)

    def dedup_exact(self, *cols: str) -> "Pipeline":
        """Keep one row per distinct value of ``cols`` (default: the
        ``value`` column) — the chainable form of catalog dedup_exact.
        Deterministic canonical row: the one with the smallest seq when
        ordered (stream order preserved, seq re-ranked gap-free), else
        dropDuplicates (any one row, one shuffle)."""
        keys = list(cols) or [VALUE]
        if self.ordered:
            w = Window.partitionBy(*keys).orderBy(SEQ)
            kept = (
                self.df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            return self._reseq(kept)
        return self._derive(self.df.dropDuplicates(keys))

    def sample_hash(self, rate: float, key_col: str | None = None, salt: str = "s|") -> "Pipeline":
        """Deterministic uniform sample (catalog/sampling.py semantics):
        keep iff md5(salt||key) prefix falls below the rate threshold.
        Map-only, reproducible across runs/engines/cluster sizes. On an
        ordered stream the surviving rows are re-ranked gap-free."""
        from flod_spark.catalog.sampling import _hash_prefix, _thr

        key = F.col(key_col) if key_col else (F.col(SEQ) if self.ordered else F.col(VALUE))
        kept = self.df.filter(_hash_prefix(salt, key) < _thr(rate))
        return self._reseq(kept) if self.ordered else self._derive(kept)

    def split(self, fracs: dict[str, float], key_col: str | None = None, salt: str = "p|") -> dict[str, "Pipeline"]:
        """Deterministic disjoint splits (e.g. {'train': .8, 'val': .1,
        'test': .1}); membership is a pure function of the key, so
        appending data never moves an existing row between splits. On an
        ordered stream each split is re-ranked gap-free."""
        from flod_spark.catalog.sampling import _hash_prefix, _thr

        if abs(sum(fracs.values()) - 1.0) > 1e-9:
            raise ValueError("split fractions must sum to 1")
        key = F.col(key_col) if key_col else (F.col(SEQ) if self.ordered else F.col(VALUE))
        hp = _hash_prefix(salt, key)
        out: dict[str, Pipeline] = {}
        lo = 0.0
        for name, frac in fracs.items():
            hi = lo + frac
            cond = hp < _thr(hi) if hi < 1.0 else F.lit(True)
            if lo > 0.0:
                cond = cond & (hp >= _thr(lo))
            kept = self.df.filter(cond)
            out[name] = self._reseq(kept) if self.ordered else self._derive(kept)
            lo = hi
        return out

    def quality_filter(self, text_col: str | None = None) -> "Pipeline":
        """C4-style quality keep-rule (catalog doc_quality semantics, same
        constants) as a chainable filter. Map-only; ordered streams are
        re-ranked gap-free."""
        from flod_spark.catalog.text import quality_keep_col

        col = text_col or VALUE
        if col == "text":
            kept = self.df.filter(quality_keep_col())
        else:
            if "text" in self.df.columns:
                raise ValueError("stream already has a 'text' column; pass text_col='text'")
            kept = self.df.withColumn("text", F.col(col)).filter(quality_keep_col()).drop("text")
        return self._reseq(kept) if self.ordered else self._derive(kept)

    def pii_scrub(self, text_col: str | None = None) -> "Pipeline":
        """PII redaction (catalog pii_scrub semantics, same patterns):
        emails, phone numbers, and IPv4 addresses -> typed placeholders,
        in that order (emails first so their digits can't leak into the
        IP pattern). Map-only JVM regexp; no shuffle."""
        from flod_spark.catalog.text import PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE

        col = text_col or VALUE
        scrubbed = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(col), PII_EMAIL_RE, "<EMAIL>"),
                PII_PHONE_RE,
                "<PHONE>",
            ),
            PII_IP_RE,
            "<IP>",
        )
        return self._derive(self.df.withColumn(col, scrubbed))

    def winnow(self, id_col: str = "doc_id", text_col: str = "text") -> "Pipeline":
        """Append the Karp-Rabin winnowing sketch columns (n_grams,
        n_selected, fp_sketch — catalog fingerprint_winnow semantics):
        the partial-overlap-robust fingerprint for near-dup triage. One
        co-partitioned join on the id; docs too short to fingerprint
        keep NULL sketch columns."""
        from flod_spark.catalog.text import winnow_sketch

        sk = winnow_sketch(
            self.df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        ).withColumnRenamed("doc_id", id_col)
        return self._derive(self.df.join(sk, id_col, "left"))

    def repetition_filter(self, text_col: str | None = None) -> "Pipeline":
        """Gopher-style repetition drop-rule (catalog doc_repetition
        semantics, same thresholds) as a chainable filter. Map-only."""
        from flod_spark.catalog.text import REP_MAX_DUP1, REP_MAX_DUP2, TOKEN_RE, _dup_col

        col = text_col or VALUE
        with_tk = self.df.withColumn(
            "tk", F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_RE), F.lit(0))
        )
        kept = with_tk.filter(
            ~((_dup_col(1) > REP_MAX_DUP1) | (_dup_col(2) > REP_MAX_DUP2))
        ).drop("tk")
        return self._reseq(kept) if self.ordered else self._derive(kept)

    def decontaminate(self, bench: "Pipeline", text_col: str | None = None, bench_col: str | None = None) -> "Pipeline":
        """Drop rows sharing >= DECON_MIN_OVERLAP token n-grams with the
        benchmark pipeline (catalog decontaminate semantics). The bench
        gram set stays a DataFrame end-to-end: its distinct grams collapse
        to ONE array row that a broadcast crossJoin hands to every task
        (never through the driver), then a map-only array_intersect scores
        each row — sound because benchmarks are MBs by definition. The
        catalog query (catalog/dedup.py::decontaminate) shows the
        exploded broadcast-JOIN form for when the gram set is too big for
        one array; both shapes keep the corpus side shuffle-free."""
        from flod_spark.catalog.dedup import DECON_MIN_OVERLAP, _ngram_arr_col
        from flod_spark.catalog.text import TOKEN_RE

        def grams(df: DataFrame, col: str):
            return df.withColumn(
                "tk", F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_RE), F.lit(0))
            ).select(F.explode(_ngram_arr_col()).alias("g"))

        bench_arr = (
            grams(bench.df, bench_col or VALUE)
            .distinct()
            .agg(F.collect_list("g").alias("_bench_grams"))
        )  # exactly one row; size bounded by the benchmark, not the corpus
        col = text_col or VALUE
        mine = self.df.withColumn(
            "tk", F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_RE), F.lit(0))
        ).crossJoin(F.broadcast(bench_arr))
        overlap = F.size(
            F.array_intersect(
                _ngram_arr_col(),
                F.coalesce(F.col("_bench_grams"), F.array().cast("array<string>")),
            )
        )
        kept = mine.filter(overlap < DECON_MIN_OVERLAP).drop("tk", "_bench_grams")
        return self._reseq(kept) if self.ordered else self._derive(kept)

    # ---- sinks (SURVEY §2.3) -------------------------------------------
    def to_array(self) -> list[Row]:
        """ArraySink package.d:69-112 — materialize to driver (ordered if seq)."""
        df = self.df.orderBy(SEQ) if self.ordered else self.df
        return df.collect()

    def discard(self) -> int:
        """NullSink package.d:43-66 — consume & drop; returns count consumed."""
        return self.df.count()

    def copy_to(self, target: list) -> None:
        """RangeSink range.d:133-167 — stream into a caller-supplied output
        range (partition-at-a-time via toLocalIterator, bounded driver memory)."""
        df = self.df.orderBy(SEQ) if self.ordered else self.df
        for row in df.toLocalIterator():
            target.append(row)

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        """FileWriter file.d:36-67 analog for columnar data."""
        self.df.write.mode(mode).parquet(path)

    def write_text(self, path: str, mode: str = "overwrite") -> None:
        """FileWriter for char streams: one line per element."""
        df = self.df.orderBy(SEQ) if self.ordered else self.df
        df.select(F.col(VALUE).cast("string")).write.mode(mode).text(path)

    def __iter__(self) -> Iterator[Row]:
        """Entry point B (pipeline.d:467-470, range.d:309-340): pipeline as
        lazy input range — partition-at-a-time iteration, not full collect."""
        df = self.df.orderBy(SEQ) if self.ordered else self.df
        return iter(df.toLocalIterator())


# ---- sources (SURVEY §2.1) ---------------------------------------------

def read_parquet(spark: SparkSession, path: str) -> Pipeline:
    """S1 read()/FileReader file.d:14-34 — columnar scan (filter/projection
    pushdown verified in tests/test_plans.py)."""
    return Pipeline(spark.read.parquet(path))


def read_text(spark: SparkSession, path: str) -> Pipeline:
    """S1 for char streams: native line splitting in the scan."""
    df = spark.read.text(path).withColumnRenamed("value", VALUE)
    return Pipeline(df)


def from_array(spark: SparkSession, data: Iterable[Any], type_hint: str = "long") -> Pipeline:
    """S2 ArraySource/pipeFromArray range.d:25-45 — in-memory array source.
    Carries seq = array index (flod arrays are inherently ordered)."""
    rows = [(i, v) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, schema=f"{SEQ} long, {VALUE} {type_hint}")
    return Pipeline(df, ordered=True)


def from_range(spark: SparkSession, start: int, stop: int, step: int = 1) -> Pipeline:
    """S3 pipeFromInputRange range.d:58-87 — lazy numeric range, fully
    distributed (spark.range plans a parallel Range scan, no driver data)."""
    df = (
        spark.range(start, stop, step)
        .withColumn(SEQ, F.expr(f"(id - {start}) div {step}"))
        .withColumnRenamed("id", VALUE)
        .select(SEQ, VALUE)
    )
    return Pipeline(df, ordered=True)


def from_generator(spark: SparkSession, gen: Callable[[], Iterable[Any]], type_hint: str = "long") -> Pipeline:
    """S4 DelegateSource/pass!(E, fun) range.d:169-189: driver callback
    produces elements (flod's push-source). Batch analog: materialize the
    generator through Arrow. For unbounded use streaming/queue.py."""
    return from_array(spark, list(gen()), type_hint)


class Queue:
    """S5 OutputRangeSource range.d:211-237 — the *caller* pushes elements in
    (put). Batch analog: buffer chunks, snapshot to a Pipeline on demand.
    Streaming analog in streaming/queue.py feeds micro-batches."""

    def __init__(self, spark: SparkSession, type_hint: str = "long"):
        self.spark = spark
        self.type_hint = type_hint
        self._buf: list[Any] = []

    def put(self, chunk: Iterable[Any]) -> None:
        self._buf.extend(chunk)

    def snapshot(self) -> Pipeline:
        return from_array(self.spark, self._buf, self.type_hint)
