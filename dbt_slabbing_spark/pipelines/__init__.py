"""The reference's two pipelines, re-expressed as Spark SQL programs.

- ``mapping``: DICOM-metadata scan → clinical joins → mapping table
  (reference ``src/generate_mapping.py``).
- ``ground_truths``: mapping table → filtered/classified/grouped labels
  (reference ``src/load_ground_truths.py``).
"""
