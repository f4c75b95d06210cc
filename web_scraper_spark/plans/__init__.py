"""Crawl-round orchestration, checkpoint/resume, metrics."""
