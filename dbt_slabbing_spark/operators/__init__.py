"""Custom operators the engine adds on top of built-in Spark SQL.

Everything here is expression/DataFrame composition — JVM-side,
whole-stage-codegen-friendly. No row-at-a-time Python in any hot path;
the only Python crossings in the package are the Arrow-batched pandas
UDFs in ``sources/dicom.py`` and ``operators/multimodal.py`` (opaque
binary decode, which Spark cannot express natively).
"""
