"""Crawl planning: frontier scheduling, seen-set, fetch/parse, BSP loop."""
