"""Sources: input-table readers, synthetic corpus generation, query logs."""
