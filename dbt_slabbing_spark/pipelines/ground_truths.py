"""Ground-truth label pipeline — Spark re-expression of the reference's
``get_ea1141_dbt_truths`` (``/root/reference/src/load_ground_truths.py:3-81``).

The reference is an eager per-record Python loop over a JSON document;
here the same semantics are one declarative DataFrame program:

    filter (P8) → mode combination (F3/A5) → truthy filter + cast
    (P9/P11) → biopsy/acr4+ classification (F4/F5) → scope key (F7) →
    ordered grouped collect (A4)

(operator ids from SURVEY.md §2). Every branch cites the reference line
it mirrors; the golden-replay test runs all 18 reachable option
combinations against the shipped ``ea1141-mapping.json`` and demands
exact equality — including list order inside each group, which is why
the collect is sorted by the record order ``_ord`` (Python dict
insertion order in the reference; ``collect_list`` order is undefined
in Spark, so a naive port would be silently nondeterministic).

Scale: at 100 TB-of-mappings this is one shuffle (the groupBy); all
classification is per-row expression work. The JSON-object input shape
(one giant map) is itself the scale bottleneck in the reference — the
engine also accepts any record-per-row DataFrame with the same columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Struct of one mapping record (value side of the JSON object;
#: reference src/generate_mapping.py:146-152).
MAPPING_VALUE_SCHEMA = (
    "PatientID string, StudyInstanceUID string, SeriesInstanceUID string, "
    "ImageShape array<int>, SeriesDescription string, FrameLaterality string, "
    "ImagePath string, Subject_DE string, DBT_BIRADS string, MRI_BIRADS string, "
    "DBT_Outcome string, MRI_Outcome string"
)

SCOPES = ("volume-wise", "breast-wise", "patient-wise")
GT_TYPES = ("biopsy", "acr4+")


def read_mapping(spark: SparkSession, path: str) -> DataFrame:
    """Shipped mapping JSON (one object keyed by SOPInstanceUID) →
    record-per-row DataFrame with ``_ord`` = file insertion order.

    Spark-native parse: whole-document text → ``from_json`` into a
    MapType (which preserves the document's key order) → ``posexplode``.
    """
    raw = spark.read.text(path, wholetext=True)
    parsed = raw.select(
        F.posexplode(F.from_json(F.col("value"), f"map<string, struct<{MAPPING_VALUE_SCHEMA}>>")).alias(
            "_ord", "uid", "v"
        )
    )
    return parsed.select("_ord", "uid", "v.*")


def ground_truth_labels(
    mapping: DataFrame,
    gt_type: str = "biopsy",
    scope: str = "volume-wise",
    dbt_only: bool = True,
    mri_excluded: bool = True,
) -> DataFrame:
    """(key, uids array<string>, truth array<array<int>>) per group.

    Exact semantics of load_ground_truths.py:3-81; argument validation
    mirrors the reference's ValueError branches (:64-65, :76-77).
    """
    if gt_type not in GT_TYPES:
        raise ValueError(f"The gt_type:{gt_type} is not yet handle.")
    if scope not in SCOPES:
        raise ValueError(f"The scope: {scope} is not yet handle.")

    dbt_b, mri_b = F.col("DBT_BIRADS"), F.col("MRI_BIRADS")

    # P8 (:27): both BIRADS non-null — drops ambiguous-laterality rows.
    df = mapping.filter(dbt_b.isNotNull() & mri_b.isNotNull())

    # F3/A5 (:28-34): mode combination. String comparison is safe — the
    # domain is single chars '1'..'5' (same ordering as the reference's
    # Python string compare).
    if not dbt_only:
        global_birads = F.greatest(dbt_b, mri_b)
    elif mri_excluded:
        global_birads = F.when(mri_b > dbt_b, F.lit(None).cast("string")).otherwise(dbt_b)
    else:
        global_birads = dbt_b

    # P9/P11 (:36-38): truthy filter (domain never '', so null-check
    # suffices) then int cast.
    df = df.withColumn("_gb", global_birads.cast("int")).filter(F.col("_gb").isNotNull())

    benign, malignant = F.array(F.lit(1), F.lit(0)), F.array(F.lit(0), F.lit(1))

    if gt_type == "biopsy":
        # F5 (:40-59).
        dbt_o, mri_o = F.col("DBT_Outcome"), F.col("MRI_Outcome")
        undesirable = lambda c: c.isNull() | (c == "UNKNOWN")  # noqa: E731  (:43)
        dbt01 = F.when(dbt_o == "MALIGNANT", 1).otherwise(0)  # (:49; None → 0)
        mri01 = F.when(mri_o == "MALIGNANT", 1).otherwise(0)  # (:50)
        if not dbt_only:
            combined = F.greatest(dbt01, mri01)  # (:52)
        elif mri_excluded:
            combined = F.when(mri01 > dbt01, F.lit(None).cast("int")).otherwise(dbt01)  # (:55)
        else:
            combined = dbt01  # (:57)
        truth = (
            F.when(F.col("_gb") < 3, benign)  # (:44-45)
            .when(undesirable(dbt_o) & undesirable(mri_o), F.lit(None))  # (:46-47)
            .otherwise(F.when(combined == 1, malignant).when(combined == 0, benign))  # (:58-59)
        )
    else:  # acr4+
        truth = F.when(F.col("_gb") > 3, malignant).otherwise(benign)  # F4 (:61-63)

    # (:67) `if global_truth:` — nulls drop (lists are always truthy).
    df = df.withColumn("_truth", truth).filter(F.col("_truth").isNotNull())

    # F7 (:68-77): scope key. studyDir = ImagePath.split('/')[-2] — the
    # StudyDate directory (NOT StudyInstanceUID; the reference docstring
    # is wrong, the code is authoritative — SURVEY.md §2.5 F7).
    study_dir = F.element_at(F.split(F.col("ImagePath"), "/"), -2)
    if scope == "volume-wise":
        key = F.col("uid")
    elif scope == "breast-wise":
        key = F.concat_ws("_", F.col("Subject_DE"), study_dir, F.upper(F.col("FrameLaterality")))
    else:  # patient-wise
        key = F.concat_ws("_", F.col("Subject_DE"), study_dir)

    # A4 (:78-80): grouped accumulation in record order. collect_list
    # order is nondeterministic in Spark → collect (ord, uid, truth)
    # structs and sort by ord inside the array.
    grouped = (
        df.select(key.alias("key"), "_ord", "uid", "_truth")
        .groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct("_ord", "uid", "_truth"))).alias("_items"))
    )
    return grouped.select(
        "key",
        F.transform("_items", lambda s: s["uid"]).alias("uids"),
        F.transform("_items", lambda s: s["_truth"]).alias("truth"),
    )
