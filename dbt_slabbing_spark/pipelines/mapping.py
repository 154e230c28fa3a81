"""Mapping pipeline — Spark re-expression of the reference's
``get_ea1141_dbt_mapping`` (``src/generate_mapping.py:111-156``).

The reference walks the archive serially and, PER IMAGE, re-reads all
three clinical CSVs and replays a stateful fold over the lesion rows
(O(images × csv_rows), ``:39-44,115,142``). Here the correlated lookup
is decorrelated into aggregations computed ONCE and broadcast:

- screening lookup  = first-row-per-subject (setdefault, ``:106``)
- lesion fold       = per-subject aggregate capturing exactly the
  fold's observable state (SURVEY.md §2.3 note (a)):
    * ``birads`` survives iff NO row of the subject has non-matching
      laterality (a non-matching row nulls it, ``:72-75,88-92``, and
      nothing ever restores it);
    * ``biopsy``  = outcome-classification of the LAST row in file
      order if that row's laterality matches, else null (every row
      overwrites it, ``:63-70`` / ``:71-75``).

So the whole fold reduces to four per-subject aggregates: row count,
matching-row counts per laterality code, ``max_by(lat, _line_no)``,
``max_by(class, _line_no)`` — one shuffle per lesion table at any
scale, no window even needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: F1 outcome classifier lists (src/generate_mapping.py:52-55).
BENIGN_MARKERS = ("BIRADS 1", "BIRADS 2", "BIRADS 3", "Benign", "No biopsy", "BI-RADS score downgraded")
MALIGNANT_MARKERS = ("Invasive", "DCIS")


def classify_outcome(col: Column) -> Column:
    """BENIGN/MALIGNANT/UNKNOWN with benign-list precedence
    (``:65-70``: the elif makes 'Benign with atypia…' BENIGN even
    though biopsy-positive-sounding, and '.F'/'Unknown' UNKNOWN)."""
    return (
        F.when(col.rlike("|".join(BENIGN_MARKERS)), "BENIGN")
        .when(col.rlike("|".join(MALIGNANT_MARKERS)), "MALIGNANT")
        .otherwise("UNKNOWN")
    )


def _lesion_fold_state(lesions: DataFrame, lat_col: str, outcome_col: str, prefix: str) -> DataFrame:
    """Per-subject observable state of the reference's row fold."""
    cls = classify_outcome(F.col(outcome_col))
    return lesions.groupBy(F.col("SUBJECT_DE").alias(f"{prefix}_subject")).agg(
        F.count(F.lit(1)).alias(f"{prefix}_n_rows"),
        F.sum(F.when(F.col(lat_col) == "1", 1).otherwise(0)).alias(f"{prefix}_n_lat1"),
        F.sum(F.when(F.col(lat_col) == "2", 1).otherwise(0)).alias(f"{prefix}_n_lat2"),
        F.max_by(F.col(lat_col), F.col("_line_no")).alias(f"{prefix}_last_lat"),
        F.max_by(cls, F.col("_line_no")).alias(f"{prefix}_last_class"),
    )


def attach_truth_labels(
    images: DataFrame,
    screening: DataFrame,
    tomo_lesions: DataFrame,
    mri_lesions: DataFrame,
    subject_col: str = "subject_de",
    laterality_col: str = "frame_laterality",
    on_missing_subject: str = "null",
) -> DataFrame:
    """``get_truth_labels`` (``:37-94``) decorrelated: adds columns
    dbt_birads / dbt_outcome / mri_birads / mri_outcome to ``images``.

    The clinical side is tiny by contract → every join is an explicit
    broadcast; the image side never shuffles.

    ``on_missing_subject`` controls the one semantic divergence from
    the reference: a subject absent from the screening table raises
    KeyError there (``:40``). Default ``"null"`` yields null labels
    instead (the distributed-friendly behavior — one bad subject must
    not kill a 100 TB run); ``"error"`` reproduces the reference's
    failure contract via a lazy ``raise_error`` guard folded into the
    label expressions, so it fails AT EXECUTION on the executor that
    meets the row, with no extra pass over the data.
    """
    if on_missing_subject not in ("null", "error"):
        raise ValueError(f"on_missing_subject must be 'null' or 'error', got {on_missing_subject!r}")
    from ..sources.clinical import first_row_per_subject

    scr = first_row_per_subject(screening).select(
        F.col("SUBJECT_DE").alias("_scr_subject"),
        F.col("TOMO_BIRADS_YR0").alias("_scr_dbt_birads"),
        F.col("MRI_BIRADS_YR0").alias("_scr_mri_birads"),
    )
    tomo = _lesion_fold_state(tomo_lesions, "TOMO_LESIONBREAST_YR0", "TOMO_LESIONOUTCOME_YR0", "_t")
    mri = _lesion_fold_state(mri_lesions, "MRI_LESIONBREAST_YR0", "MRI_LESIONOUTCOME_YR0", "_m")

    df = (
        images.join(F.broadcast(scr), F.col(subject_col) == F.col("_scr_subject"), "left")
        .join(F.broadcast(tomo), F.col(subject_col) == F.col("_t_subject"), "left")
        .join(F.broadcast(mri), F.col(subject_col) == F.col("_m_subject"), "left")
    )

    # check_laterality (:31-34): image R ↔ lesion '1', L ↔ '2'.
    lat = F.col(laterality_col)
    match_code = F.when(lat == "R", "1").when(lat == "L", "2")

    def branch(prefix: str, screening_birads: Column) -> tuple[Column, Column]:
        n_rows = F.coalesce(F.col(f"{prefix}_n_rows"), F.lit(0))
        n_match = (
            F.when(match_code == "1", F.coalesce(F.col(f"{prefix}_n_lat1"), F.lit(0)))
            .when(match_code == "2", F.coalesce(F.col(f"{prefix}_n_lat2"), F.lit(0)))
            .otherwise(F.lit(0))
        )
        has_nonmatch = n_rows > n_match  # ≥1 row nulled the birads (:72-75)
        birads = F.when(has_nonmatch, F.lit(None).cast("string")).otherwise(screening_birads)
        last_matches = F.col(f"{prefix}_last_lat").eqNullSafe(match_code) & (n_rows > 0)
        biopsy = F.when(last_matches, F.col(f"{prefix}_last_class")).otherwise(F.lit(None).cast("string"))
        return birads, biopsy

    dbt_birads, dbt_outcome = branch("_t", F.col("_scr_dbt_birads"))
    mri_birads, mri_outcome = branch("_m", F.col("_scr_mri_birads"))

    if on_missing_subject == "error":
        # Reference parity (:40 KeyError): guard each label with a lazy
        # raise_error on screening-miss rows.
        missing = F.col("_scr_subject").isNull()
        err = F.raise_error(
            F.concat(F.lit("subject missing from screening table: "), F.col(subject_col))
        ).cast("string")
        dbt_birads = F.when(missing, err).otherwise(dbt_birads)
        dbt_outcome = F.when(missing, err).otherwise(dbt_outcome)
        mri_birads = F.when(missing, err).otherwise(mri_birads)
        mri_outcome = F.when(missing, err).otherwise(mri_outcome)

    return (
        df.withColumn("dbt_birads", dbt_birads)
        .withColumn("dbt_outcome", dbt_outcome)
        .withColumn("mri_birads", mri_birads)
        .withColumn("mri_outcome", mri_outcome)
        .drop(*[c for c in df.columns if c.startswith(("_scr_", "_t_", "_m_"))])
    )


def earliest_study_only(dicom_meta: DataFrame) -> DataFrame:
    """S2 (``:20-21``): keep only each patient's earliest study-date
    directory (string min — directory names, not parsed dates)."""
    w = Window.partitionBy("patient_id")
    return (
        dicom_meta.withColumn("_min_study", F.min("study_date").over(w))
        .filter(F.col("study_date") == F.col("_min_study"))
        .drop("_min_study")
    )


def volume_filters(dicom_meta: DataFrame) -> DataFrame:
    """P1-P5 (``:118,124-135``) with the null-keeping inequality
    semantics Python has and SQL doesn't: ``None != 10`` is True in
    Python, so the null branch must be kept EXPLICITLY here."""
    return dicom_meta.filter(
        (F.col("modality") == "MG")
        & (F.size("image_shape") == 3)
        & (~F.col("series_description").contains("Projection"))
        & ((F.col("slice_thickness") != 10) | F.col("slice_thickness").isNull())
        & ((F.col("view_modifier") != "Spot Compression") | F.col("view_modifier").isNull())
    )


def build_mapping(
    dicom_meta: DataFrame,
    screening: DataFrame,
    tomo_lesions: DataFrame,
    mri_lesions: DataFrame,
    image_root: str,
) -> DataFrame:
    """Full entry-point-1 pipeline (``:111-156``): scan filters → truth
    joins → 12-column mapping projection, keyed by SOPInstanceUID."""
    imgs = volume_filters(earliest_study_only(dicom_meta)).withColumn(
        "subject_de", F.element_at(F.split(F.col("patient_id"), "-"), -1)  # P6 (:141)
    )
    labeled = attach_truth_labels(imgs, screening, tomo_lesions, mri_lesions)
    return labeled.select(  # P7 (:146-152)
        F.col("sop_instance_uid"),
        F.col("patient_id").alias("PatientID"),
        F.col("study_instance_uid").alias("StudyInstanceUID"),
        F.col("series_instance_uid").alias("SeriesInstanceUID"),
        F.col("image_shape").alias("ImageShape"),
        F.col("series_description").alias("SeriesDescription"),
        F.col("frame_laterality").alias("FrameLaterality"),
        # S8 (:149) — literal (non-regex) replace, like str.replace.
        F.replace(F.col("path"), F.lit(image_root), F.lit("$ROOT$/")).alias("ImagePath"),
        F.col("subject_de").alias("Subject_DE"),
        F.col("dbt_birads").alias("DBT_BIRADS"),
        F.col("mri_birads").alias("MRI_BIRADS"),
        F.col("dbt_outcome").alias("DBT_Outcome"),
        F.col("mri_outcome").alias("MRI_Outcome"),
    ).dropDuplicates(["sop_instance_uid"])  # J4 (:146)
