"""Sink plane: PostgreSQL DDL emission + JDBC write planning."""
