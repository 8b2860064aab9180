"""HL7 v2 message parsing (reference README.md:3 'ingests HL7 v2',
:76 'Map HL7 segments … to the DuckDB schema', etl/loaders.py).

An HL7 v2 message is segment lines (MSH/PID/RXE/…) separated by CR, each
segment ``|``-delimited, components ``^``-delimited. The parser is pure
split/explode/getItem expressions — one codegen'd projection per message,
no Python per-row — producing one row per segment, then typed entity
extracts (patients from PID, prescriptions from RXE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_segments(messages: DataFrame,
                     msg_col: str = "message") -> DataFrame:
    """Raw message text → (msg_idx, seg_idx, seg_type, fields array)."""
    with_id = messages.withColumn(
        "msg_idx", F.monotonically_increasing_id())
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
        f.getItem(3).cast("long").alias("patient_id"),
        F.concat_ws(
            " ",
            _component(f.getItem(5), 2),
            _component(f.getItem(5), 1),
        ).alias("name"),
        F.to_date(f.getItem(7), "yyyyMMdd").alias("birth_date"),
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
        _component(f.getItem(2), 1).alias("rxcui"),
        _component(f.getItem(2), 2).alias("drug_name"),
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
