"""Sources: table catalog, synthetic fixtures, pages source."""
