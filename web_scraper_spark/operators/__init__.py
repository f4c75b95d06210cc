"""Composable DataFrame->DataFrame crawl + data-pipeline operators."""
