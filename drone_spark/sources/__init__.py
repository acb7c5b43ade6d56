"""Sources/sinks: readers for the reference's text formats, catalog I/O."""
