"""Multimodal-column plumbing: opaque binary payloads with typed
metadata, processed in Arrow-batched Pandas iterators (mapInPandas).

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (``decode_stub`` raises NotImplementedError; tests
inject a deterministic fake). What IS real and tested end-to-end is
everything Spark-side: the binary column schema, the mapInPandas batch
shape (iterator of pandas DataFrames), the output schema contract, and
the downstream aggregation — exactly the plumbing a real decoder would
drop into.

Scale notes: mapInPandas streams Arrow batches; per-batch Python cost
amortizes over spark.sql.execution.arrow.maxRecordsPerBatch rows.
Binary payloads stay off the driver, and the metadata extraction is a
narrow map — no shuffle until the final (tiny) aggregation.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..functions.exact import ieee_round

META_SCHEMA = ("doc_id long, source string, n_bytes long, "
               "header_byte long, mime string")


def decode_stub(payload: bytes) -> dict:
    """Placeholder for a real image/audio decoder (PIL/ffmpeg are not in
    this container). Wire a real decoder through ``extract_metadata``'s
    ``decoder`` argument."""
    raise NotImplementedError(
        "No media codec available in this environment; inject a decoder "
        "via extract_metadata(..., decoder=...)")


def _default_meta(payload: bytes) -> dict:
    """Deterministic metadata that needs no codec: size + header byte."""
    return {"n_bytes": len(payload),
            "header_byte": payload[0] if payload else -1,
            "mime": "application/octet-stream"}


def with_payload(docs: DataFrame) -> DataFrame:
    """Stand-in binary column: utf-8 bytes of `text`. In a real corpus
    this is the stored image/audio bytes column. NULL-text rows are
    dropped — a missing payload (failed fetch) has no bytes to decode,
    and the real-corpus scan would filter them the same way."""
    return (docs.filter(F.col("text").isNotNull())
            .withColumn("payload", F.encode("text", "utf-8")))


def extract_metadata(df: DataFrame,
                     decoder: Callable[[bytes], dict] | None = None
                     ) -> DataFrame:
    """mapInPandas over (doc_id, source, payload): per Arrow batch,
    apply ``decoder`` (default: codec-free metadata) to each payload."""
    decode = decoder or _default_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # na_action + nullable Int64: a NULL payload (possible when
            # callers feed a raw binary column directly) yields NULL
            # metadata instead of len(None) crashing the worker.
            metas = pdf["payload"].map(decode, na_action="ignore")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_bytes": metas.map(
                    lambda m: m["n_bytes"],
                    na_action="ignore").astype("Int64"),
                "header_byte": metas.map(
                    lambda m: m["header_byte"],
                    na_action="ignore").astype("Int64"),
                "mime": metas.map(lambda m: m["mime"], na_action="ignore"),
            })

    return (df.select("doc_id", "source", "payload")
            .mapInPandas(run, schema=META_SCHEMA))


def q_mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column stats per source via the Pandas-UDF path; the
    oracle recomputes byte lengths SQL-side (texts are ASCII here, but
    octet_length measures the same utf-8 payload either way)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    meta = extract_metadata(docs)
    return (meta.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_bytes").alias("total_bytes"),
                 ieee_round(F.avg("n_bytes"), 6).alias("avg_bytes"),
                 F.min("header_byte").alias("min_header")))


ORACLE_MM_BINARY_STATS = """
SELECT source, count(*) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CASE WHEN abs((avg(octet_length(encode(text))))) < 4e9 THEN floor((avg(octet_length(encode(text)))) * 1e6 + 0.5E0) / 1e6 ELSE (avg(octet_length(encode(text)))) END AS avg_bytes,
       -- first BYTE via hex-pair, not ord(): ord gives the codepoint,
       -- which diverges from payload[0] for multi-byte UTF-8 leads
       CAST(min(CASE WHEN octet_length(encode(text)) > 0
                THEN ('0x' || substr(hex(encode(text)), 1, 2))::INT
                ELSE -1 END) AS BIGINT) AS min_header
FROM documents WHERE text IS NOT NULL GROUP BY source
"""


# --- frame sampling (1 -> N row explosion through mapInPandas) ----------

FRAME_SIZE = 64     # bytes per "frame" of the opaque payload
FRAME_STEP = 4      # keep every 4th frame (uniform temporal sampling)

FRAME_SCHEMA = ("doc_id long, frame_idx long, offset long, "
                "frame_bytes long, first_byte long, last_byte long")


def sample_frames(df: DataFrame,
                  frame_size: int = FRAME_SIZE,
                  step: int = FRAME_STEP) -> DataFrame:
    """Frame-sample an opaque media payload: treat the binary column as
    a sequence of fixed-size frames, keep every ``step``-th frame, and
    emit one row per sampled frame with codec-free per-frame features.

    This is the video/audio frame-sampling *plumbing* — the 1→N
    mapInPandas shape (one input row yields many output rows inside an
    Arrow batch), the deterministic sampling policy, and the typed
    per-frame schema. A real decoder replaces the byte-slicing with
    codec output; everything Spark-side stays identical. No shuffle:
    the explosion is a narrow map, and frames inherit the input's
    partitioning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "offset",
                                   "frame_bytes", "first_byte",
                                   "last_byte")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, step):
                    off = idx * frame_size
                    frame = data[off:off + frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["offset"].append(off)
                    out["frame_bytes"].append(len(frame))
                    out["first_byte"].append(frame[0])
                    out["last_byte"].append(frame[-1])
            yield pd.DataFrame(out)

    return (df.select("doc_id", "payload")
            .mapInPandas(run, schema=FRAME_SCHEMA))


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs)


# Per-frame BYTE features are read off the hex rendering of the
# ENCODED payload (two hex chars per byte): DuckDB cannot substring
# BLOBs, and character-level substr/ord on `text` would diverge from
# the byte slicing for any multi-byte UTF-8 character (ord gives the
# CODEPOINT, not the first byte — found by the adversarial fuzz on a
# Hebrew token). Hex-pair slicing is byte-exact for any input.
ORACLE_MM_FRAME_SAMPLE = f"""
WITH d AS (
    SELECT doc_id, hex(encode(text)) AS h,
           octet_length(encode(text)) AS n
    FROM documents WHERE text IS NOT NULL),
s AS (
    SELECT doc_id, h, n,
           unnest(range(0, ((n + {FRAME_SIZE} - 1) // {FRAME_SIZE}
                            + {FRAME_STEP} - 1) // {FRAME_STEP}))
               AS samp
    FROM d)
SELECT doc_id,
       samp * {FRAME_STEP} AS frame_idx,
       samp * {FRAME_STEP} * {FRAME_SIZE} AS offset,
       least({FRAME_SIZE}, n - samp * {FRAME_STEP} * {FRAME_SIZE})
           AS frame_bytes,
       ('0x' || substr(h, samp * {FRAME_STEP} * {FRAME_SIZE} * 2 + 1, 2))
           ::BIGINT AS first_byte,
       ('0x' || substr(h,
                       (samp * {FRAME_STEP} * {FRAME_SIZE}
                        + least({FRAME_SIZE},
                                n - samp * {FRAME_STEP} * {FRAME_SIZE})
                        - 1) * 2 + 1, 2))::BIGINT AS last_byte
FROM s
"""


# --- real codec-free decode: fixed-layout image-header parsing ----------

def synth_png_payload() -> F.Column:
    """A structurally valid PNG prefix (magic + IHDR chunk) with
    width/height derived from doc_id — the deterministic stand-in for a
    stored image bytes column, faithful enough that a real PNG parser
    would accept the header layout."""
    return F.expr(
        "concat(unhex('89504E470D0A1A0A'), "            # PNG magic
        "unhex(lpad(hex(13), 8, '0')), "                # IHDR length
        "unhex('49484452'), "                           # 'IHDR'
        "unhex(lpad(hex(16 + doc_id % 64), 8, '0')), "  # width
        "unhex(lpad(hex(16 + (doc_id * 7) % 64), 8, '0')), "  # height
        "unhex('0802000000'))")                         # depth/color/...


def q_mm_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dimensions WITHOUT a codec and WITHOUT Python: PNG IHDR
    width/height live at fixed byte offsets, so the 'decode' is
    hex + substring + base-16 parse — pure codegen column expressions
    over the binary column. This is the scale-path counterpart to the
    mapInPandas decoder plumbing above: for fixed-layout header fields
    (dimensions, sample rate, duration) a 100 TB pipeline should parse
    JVM-side and reserve Python decoders for actual pixel/sample work.
    The magic check doubles as format validation (malformed rows
    surface as valid_magic=false, the silent-drop hook)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    p = docs.withColumn("payload", synth_png_payload())
    hx = F.hex("payload")
    width = F.conv(F.substring(hx, 33, 8), 16, 10).cast("long")
    height = F.conv(F.substring(hx, 41, 8), 16, 10).cast("long")
    return p.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        (F.substring(hx, 1, 16) == "89504E470D0A1A0A").alias("valid_magic"),
        width.alias("width"), height.alias("height"),
        ieee_round(width.cast("double") / height, 6).alias("aspect_ratio"))


ORACLE_MM_IMAGE_DIMS = """
WITH p AS (
    SELECT doc_id,
           unhex('89504E470D0A1A0A') || unhex(lpad(to_hex(13), 8, '0'))
           || unhex('49484452')
           || unhex(lpad(to_hex(16 + doc_id % 64), 8, '0'))
           || unhex(lpad(to_hex(16 + (doc_id * 7) % 64), 8, '0'))
           || unhex('0802000000') AS payload
    FROM documents)
SELECT doc_id,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       substring(hex(payload), 1, 16) = '89504E470D0A1A0A' AS valid_magic,
       ('0x' || substring(hex(payload), 33, 8))::BIGINT AS width,
       ('0x' || substring(hex(payload), 41, 8))::BIGINT AS height,
       CASE WHEN abs((('0x' || substring(hex(payload), 33, 8))::BIGINT::DOUBLE
             / ('0x' || substring(hex(payload), 41, 8))::BIGINT)) < 4e9 THEN floor((('0x' || substring(hex(payload), 33, 8))::BIGINT::DOUBLE
             / ('0x' || substring(hex(payload), 41, 8))::BIGINT) * 1e6 + 0.5E0) / 1e6 ELSE (('0x' || substring(hex(payload), 33, 8))::BIGINT::DOUBLE
             / ('0x' || substring(hex(payload), 41, 8))::BIGINT) END
           AS aspect_ratio
FROM p
"""


# --- resize (downsample) through the Pandas-UDF decode path -------------

RESIZE_SCALE = 2    # keep every 2nd byte — nearest-neighbor downsample


def resize_payloads(df: DataFrame, scale: int = RESIZE_SCALE) -> DataFrame:
    """Deterministic stand-in for an image/audio resize: nearest-
    neighbor byte subsampling of the opaque payload (every ``scale``-th
    byte) inside Arrow-batched mapInPandas — the same batch shape,
    schema contract, and per-row Python work a real PIL/ffmpeg resize
    drops into, minus the codec this container lacks. Emits the
    resized payload's size and content hash so correctness of the
    TRANSFORM (not just the plumbing) is checkable end to end.

    The hash is md5 of the UPPERCASE HEX of the subsampled bytes, not
    of the raw bytes: DuckDB's md5 only accepts VARCHAR, and a byte
    subsample of multibyte UTF-8 is not valid UTF-8, so hashing raw
    bytes would make the oracle ASCII-only. Hex is injective, valid
    text for ANY bytes, and case-matches DuckDB's hex(BLOB)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf["payload"].map(bytes)
            sub = data.map(lambda b: b[::scale])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes_in": data.map(len).astype("int64"),
                "n_bytes_out": sub.map(len).astype("int64"),
                "resized_md5": sub.map(
                    lambda b: hashlib.md5(
                        b.hex().upper().encode("ascii")).hexdigest()),
            })

    return (df.select("doc_id", "payload")
            .mapInPandas(run, schema=("doc_id long, n_bytes_in long, "
                                      "n_bytes_out long, resized_md5 string")))


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return resize_payloads(docs)


# The oracle reconstructs the byte subsample on the ENCODED bytes
# (hex-pair slicing — DuckDB cannot substring BLOBs), so parity holds
# for any UTF-8 fixture text, not just ASCII; both engines hash the
# uppercase-hex rendering of the subsampled bytes (see resize_payloads).
ORACLE_MM_RESIZE = f"""
WITH s AS (
    SELECT doc_id, octet_length(encode(text)) AS n_in,
           hex(encode(text)) AS h
    FROM documents WHERE text IS NOT NULL),
b AS (
    SELECT doc_id, n_in,
           -- coalesce: DuckDB array_to_string([]) is NULL, but Spark's
           -- concat_ws-equivalent path gives '' for an empty payload
           coalesce(array_to_string(list_transform(
               range(1, n_in + 1, {RESIZE_SCALE}),
               i -> substr(h, (i - 1) * 2 + 1, 2)), ''), '') AS sub_hex
    FROM s)
SELECT doc_id,
       CAST(n_in AS BIGINT) AS n_bytes_in,
       CAST(length(sub_hex) / 2 AS BIGINT) AS n_bytes_out,
       md5(sub_hex) AS resized_md5
FROM b
"""


# --- codec-free AUDIO header decode (WAV/RIFF) ---------------------------
#
# The audio twin of q_mm_image_dims: WAV stores its format fields at
# fixed byte offsets in the 44-byte RIFF header, LITTLE-endian — so the
# "decode" is hex + substring + byte-pair reversal + base-16 parse,
# pure codegen column expressions. The LE reversal is the part a naive
# port gets wrong (PNG's fields are big-endian; WAV's are not).


def _le_hex(h: str, nbytes: int) -> str:
    """Hex chars of an ``nbytes``-wide little-endian field (given as
    ``h`` = its raw hex substring) re-ordered to big-endian for a
    base-16 parse — byte pairs reversed. Dialect-neutral text."""
    pairs = [f"substring({h}, {2 * i + 1}, 2)"
             for i in reversed(range(nbytes))]
    return "concat(" + ", ".join(pairs) + ")"


def synth_wav_payload() -> F.Column:
    """Deterministic 44-byte WAV header per doc_id (PCM, fields LE):
    sample rate 8-36 kHz, 1-2 channels, 16-bit, synthetic data size.
    Same role as synth_png_payload — any real WAV reader would accept
    the layout (the data chunk is declared, not materialized)."""
    le32 = lambda v: (f"unhex({_le_hex(f'lpad(hex({v}), 8, __q__0__q__)', 4)})"
                      .replace("__q__", "'"))
    le16 = lambda v: (f"unhex({_le_hex(f'lpad(hex({v}), 4, __q__0__q__)', 2)})"
                      .replace("__q__", "'"))
    rate = "(8000 + (doc_id % 8) * 4000)"
    chans = "(1 + doc_id % 2)"
    dsize = "(1000 + (doc_id * 13) % 9000)"
    return F.expr(
        "concat(unhex('52494646'), "            # 'RIFF'
        f"{le32(f'(36 + {dsize})')}, "          # chunk size
        "unhex('57415645'), "                   # 'WAVE'
        "unhex('666D7420'), "                   # 'fmt '
        f"{le32('16')}, "                       # fmt chunk size
        f"{le16('1')}, "                        # PCM
        f"{le16(chans)}, "
        f"{le32(rate)}, "
        f"{le32(f'({rate} * {chans} * 2)')}, "  # byte rate
        f"{le16(f'({chans} * 2)')}, "           # block align
        f"{le16('16')}, "                       # bits/sample
        "unhex('64617461'), "                   # 'data'
        f"{le32(dsize)})")


def q_mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata WITHOUT a codec and WITHOUT Python: channels,
    sample rate, bit depth, declared data size, and play duration from
    the fixed-offset RIFF/WAV header fields — JVM-side expressions
    only, the scale path for header-resident audio metadata (duration
    histograms, sample-rate gates) over a 100 TB media corpus. The
    RIFF+WAVE magic check doubles as format validation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    p = docs.withColumn("payload", synth_wav_payload())
    hx = F.hex("payload")

    def le(first_byte: int, nbytes: int) -> F.Column:
        sub = (f"substring(hx, {2 * first_byte + 1}, {2 * nbytes})")
        return F.conv(F.expr(_le_hex(f"({sub})", nbytes)), 16, 10) \
            .cast("long")

    p = p.withColumn("hx", hx)
    chans, rate = le(22, 2), le(24, 4)
    bits, dsize = le(34, 2), le(40, 4)
    dur = F.try_divide(dsize.cast("double"),
                       rate * chans * (bits / F.lit(8)).cast("long"))
    return p.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        ((F.expr("substring(hx, 1, 8)") == "52494646")
         & (F.expr("substring(hx, 17, 8)") == "57415645"))
        .alias("valid_riff"),
        chans.alias("channels"), rate.alias("sample_rate"),
        bits.alias("bits_per_sample"), dsize.alias("data_bytes"),
        ieee_round(dur, 6).alias("duration_s"))


def _mm_audio_oracle() -> str:
    le32 = lambda v: ("unhex(" + _le_hex(
        f"lpad(to_hex({v}), 8, '0')", 4) + ")")
    le16 = lambda v: ("unhex(" + _le_hex(
        f"lpad(to_hex({v}), 4, '0')", 2) + ")")
    rate = "(8000 + (doc_id % 8) * 4000)"
    chans = "(1 + doc_id % 2)"
    dsize = "(1000 + (doc_id * 13) % 9000)"
    parse = lambda fb, nb: ("('0x' || " + _le_hex(
        f"(substring(hx, {2 * fb + 1}, {2 * nb}))", nb) + ")::BIGINT")
    c, r = parse(22, 2), parse(24, 4)
    b, d = parse(34, 2), parse(40, 4)
    from ..functions.exact import ieee_round_sql
    dur = f"CAST({d} AS DOUBLE) / ({r} * {c} * ({b} // 8))"
    return f"""
WITH p AS (
    SELECT doc_id,
           unhex('52494646') || {le32(f'(36 + {dsize})')}
           || unhex('57415645') || unhex('666D7420')
           || {le32('16')} || {le16('1')} || {le16(chans)}
           || {le32(rate)} || {le32(f'({rate} * {chans} * 2)')}
           || {le16(f'({chans} * 2)')} || {le16('16')}
           || unhex('64617461') || {le32(dsize)} AS payload
    FROM documents),
h AS (SELECT doc_id, payload, hex(payload) AS hx FROM p)
SELECT doc_id,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       substring(hx, 1, 8) = '52494646'
           AND substring(hx, 17, 8) = '57415645' AS valid_riff,
       {c} AS channels, {r} AS sample_rate,
       {b} AS bits_per_sample, {d} AS data_bytes,
       {ieee_round_sql(dur, 6)} AS duration_s
FROM h
"""


ORACLE_MM_AUDIO_META = _mm_audio_oracle()
