"""Logical plans: the micro-batch crawl pipeline driver (SURVEY §3.4)."""
