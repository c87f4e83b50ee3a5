"""Sources: readers + adapters for the interleaved documents table."""
