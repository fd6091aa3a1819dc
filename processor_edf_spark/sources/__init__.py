from processor_edf_spark.sources.edf import (
    decode_annotations,
    decode_samples,
    parse_signal_headers,
    scan_edf_files,
)

__all__ = [
    "scan_edf_files",
    "parse_signal_headers",
    "decode_samples",
    "decode_annotations",
]
