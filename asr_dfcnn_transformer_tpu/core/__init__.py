"""Core: configuration tree, constants, vocabularies, mesh setup."""
