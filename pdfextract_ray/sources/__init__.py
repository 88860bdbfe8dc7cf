"""Corpus sources: deterministic synthetic web-page corpus + readers."""
