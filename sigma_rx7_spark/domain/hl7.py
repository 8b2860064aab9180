"""HL7 v2 message parsing (reference README.md:3 'ingests HL7 v2',
:76 'Map HL7 segments … to the DuckDB schema', etl/loaders.py).

An HL7 v2 message is segment lines (MSH/PID/RXE/…) separated by CR, each
segment ``|``-delimited, components ``^``-delimited. The parser is pure
split/explode/getItem expressions — one codegen'd projection per message,
no Python per-row — producing one row per segment, then typed entity
extracts (patients from PID, prescriptions from RXE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_segments(messages: DataFrame,
                     msg_col: str = "message") -> DataFrame:
    """Raw message text → (msg_idx, seg_idx, seg_type, fields array).

    msg_idx is the md5 of the message CONTENT, not
    ``monotonically_increasing_id``: the id is consumed as a join key
    between two branches of the same plan (PID rows ⋈ RXE rows), and
    monotonic ids are partition-dependent — the branches can evaluate
    with different partition layouts and desync (observed as a flaky
    oracle mismatch under a busy session). A content hash is stable
    under any re-evaluation; HL7 messages carry a control id (MSH-10)
    precisely so batches have a per-message key, and hashing the full
    text is the schema-free equivalent."""
    with_id = messages.withColumn("msg_idx", F.md5(F.col(msg_col)))
    segs = with_id.select(
        "msg_idx",
        F.posexplode(F.split(F.col(msg_col), r"\r\n|\r|\n"))
        .alias("seg_idx", "segment"),
    ).where(F.length("segment") > 0)
    fields = F.split(F.col("segment"), r"\|")
    return segs.select(
        "msg_idx", "seg_idx",
        fields.getItem(0).alias("seg_type"),
        fields.alias("fields"),
    )


def _component(field, i: int):
    """i-th ^-component of a field (1-based, HL7 convention)."""
    return F.split(field, r"\^").getItem(i - 1)


# HL7 v2 escape sequences (the public v2.x encoding rules): delimiter
# characters inside a VALUE must be escaped or they change the message
# structure. Escaping by chained replace is sound (escape the escape
# char first; the inserted sequences contain no later-replaced chars).
# UNescaping by global replace is NOT: "|E|" escapes to "\F\E\F\",
# which contains a false "\E\" match spanning two real tokens — so the
# decoder tokenizes left-to-right instead: split on the escape char,
# every ODD piece is an escape code, every even piece literal text
# (each \X\ sequence contributes exactly its two backslashes, and
# literals contain none, so the alternation is an invariant).
_HL7_ESC = (
    ("\\", "\\E\\"),   # escape char (must be first on render)
    ("|", "\\F\\"),    # field separator
    ("^", "\\S\\"),    # component separator
    ("~", "\\R\\"),    # repetition separator
    ("&", "\\T\\"),    # subcomponent separator
)

_ESC_CODE = {"E": "\\", "F": "|", "S": "^", "R": "~", "T": "&"}


def hl7_escape(c: Column) -> Column:
    """Value text → wire-safe HL7 text (pure replace chain, codegen'd)."""
    for raw, esc in _HL7_ESC:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def hl7_unescape(c: Column) -> Column:
    """Wire HL7 text → value text: one split + positional transform +
    join (left-to-right tokenization as pure column expressions —
    codegen'd, no Python). Malformed input degrades losslessly: an
    unknown escape code is preserved verbatim per the v2 convention,
    and an UNPAIRED trailing escape char (a code piece that is the
    last split piece, so it was never closed) is reconstituted as the
    raw text it was, not wrapped into a sequence that was never
    there."""
    parts = F.split(c, r"\\")
    n = F.size(parts)

    def decode(x: Column, i: Column) -> Column:
        code = F.when(x == "E", F.lit("\\"))
        for k, v in _ESC_CODE.items():
            if k != "E":
                code = code.when(x == k, F.lit(v))
        code = code.otherwise(F.concat(F.lit("\\"), x, F.lit("\\")))
        unclosed = F.concat(F.lit("\\"), x)
        return (F.when(i % 2 == 0, x)
                .when(i == n - 1, unclosed)
                .otherwise(code))

    return F.array_join(F.transform(parts, decode), "")


def _unesc_py(s):
    """Python twin of hl7_unescape for the UDTF slow path."""
    if s is None:
        return None
    parts = s.split("\\")
    last = len(parts) - 1
    return "".join(
        p if i % 2 == 0
        else ("\\" + p if i == last
              else _ESC_CODE.get(p, "\\" + p + "\\"))
        for i, p in enumerate(parts))


def parse_patients(segments: DataFrame) -> DataFrame:
    """PID segments → patient rows.

    PID|1|<id>|...|<family^given>|...|<YYYYMMDD birth>|<gender>
    (positions per the public HL7 v2 PID layout: PID-3 id, PID-5 name,
    PID-7 birth date, PID-8 sex).
    """
    pid = segments.where(F.col("seg_type") == "PID")
    f = F.col("fields")
    return pid.select(
        "msg_idx",
        # try_cast: real-world HL7 is messy — a malformed PID-3 must
        # become NULL and drop from the typed extract, not throw the
        # whole batch under ANSI mode (same contract as the UDTF twin's
        # int()-guard below).
        f.getItem(3).try_cast("long").alias("patient_id"),
        F.concat_ws(
            " ",
            hl7_unescape(_component(f.getItem(5), 2)),
            hl7_unescape(_component(f.getItem(5), 1)),
        ).alias("name"),
        F.try_to_date(f.getItem(7), "yyyyMMdd").alias("birth_date"),
        f.getItem(8).alias("gender"),
    )


def parse_prescriptions(segments: DataFrame) -> DataFrame:
    """RXE segments → prescription rows.

    RXE|<qty^interval>|<code^name^system>|... (RXE-2 give code per the
    public HL7 v2 RXE layout); joined back to the message's PID for the
    patient id by msg_idx.
    """
    rxe = segments.where(F.col("seg_type") == "RXE")
    f = F.col("fields")
    return rxe.select(
        "msg_idx",
        hl7_unescape(_component(f.getItem(2), 1)).alias("rxcui"),
        hl7_unescape(_component(f.getItem(2), 2)).alias("drug_name"),
        # dose_spec keeps its STRUCTURAL ^ (qty^interval) — only the
        # leaf components of coded fields are value text to unescape.
        f.getItem(1).alias("dose_spec"),
    )


def hl7_to_meds(messages: DataFrame, msg_col: str = "message") -> DataFrame:
    """Full ingest: messages → (patient_id, rxcui, drug_name) med rows —
    the HL7 path of the two-source union (README.md:3,76)."""
    segs = explode_segments(messages, msg_col)
    pats = parse_patients(segs).select("msg_idx", "patient_id")
    rx = parse_prescriptions(segs)
    return rx.join(pats, "msg_idx").select(
        "patient_id", "rxcui", "drug_name", "dose_spec")


def build_messages(meds: DataFrame) -> DataFrame:
    """Deterministic RDE^O11-style messages from med rows: one message
    per patient — MSH header, PID demographic segment, one RXE per
    prescription (sorted by med_id so the segment order is stable).

    The inverse of the ingest path, used to exercise the multi-segment
    parse (README.md:76) end to end without external message files.
    """
    seg = F.concat(
        F.lit("RXE|"), F.col("med_id").cast("string"), F.lit("^daily|"),
        hl7_escape(F.col("rxcui").cast("string")), F.lit("^"),
        hl7_escape(F.col("drug_name")),
        F.lit("^RXNORM|10||mg"))
    per_patient = (
        meds.select(
            "patient_id",
            F.struct(F.col("med_id"), seg.alias("seg")).alias("s"))
        .groupBy("patient_id")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
    )
    body = F.array_join(
        F.transform("ss", lambda s: s["seg"]), "\r")
    pid_seg = F.concat(
        F.lit("PID|1||"), F.col("patient_id").cast("string"),
        F.lit("||Patient^P||19800101|U"))
    msh = F.concat(
        F.lit("MSH|^~\\&|PHARM|HOSP|RX|HOSP|202301010800||RDE^O11|"),
        F.col("patient_id").cast("string"), F.lit("|P|2.5"))
    return per_patient.select(
        "patient_id",
        F.concat_ws("\r", msh, pid_seg, body).alias("message"),
    )


def hl7_meds_udtf():
    """X2 as a REAL Python UDTF over MULTI-SEGMENT messages: one input
    row (message) → one output row per RXE segment, with the patient id
    carried over from the message's PID segment — per-message parse
    state that a bare ``explode`` cannot express without a join (the
    native join form is ``hl7_to_meds``; this certifies the Spark 4
    ``@udtf`` LATERAL slow path against the same oracle discipline as
    q_udtf_sentences)."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="patient_id bigint, rxe_idx int, med_id bigint, "
                     "rxcui string, drug_name string")
    class Hl7Meds:
        @staticmethod
        def _med_id(f):
            # RXE-1 first component; None on malformed/non-numeric input
            # (real-world HL7 is messy — a bad segment must not kill the
            # whole batch, it just drops from the typed extract).
            try:
                return int(f[1].split("^")[0])
            except (IndexError, ValueError):
                return None

        def eval(self, message):  # noqa: ANN001 — UDTF protocol
            pid = None
            rxes = []
            for seg in re.split(r"\r\n|\r|\n", message or ""):
                if not seg:
                    continue
                f = seg.split("|")
                if f[0] == "PID":
                    try:
                        pid = int(f[3])
                    except (IndexError, ValueError):
                        pid = None
                elif f[0] == "RXE":
                    mid = self._med_id(f)
                    if mid is not None and len(f) > 2:
                        rxes.append((mid, f))
            rxes.sort(key=lambda m: m[0])
            for i, (mid, f) in enumerate(rxes):
                comp = f[2].split("^")
                name = comp[1] if len(comp) > 1 else None
                yield pid, i, mid, _unesc_py(comp[0]), _unesc_py(name)

    return Hl7Meds
