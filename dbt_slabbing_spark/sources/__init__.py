"""Sources: clinical CSV (+_line_no ordering column), DICOM binaryFile."""
