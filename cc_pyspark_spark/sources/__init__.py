"""Sources: WARC/WAT/WET record source and fixture generators."""
