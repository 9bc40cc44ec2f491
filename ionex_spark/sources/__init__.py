"""Sources & sinks: synthetic images table, IONEX text ingest, TableIO."""
