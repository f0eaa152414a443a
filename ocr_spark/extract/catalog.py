# filled in with the extraction-pipeline catalog entries (x01_...)
