"""Lakehouse table layer (SURVEY.md §2.2): DDL/DML, schema evolution,
versioned writes, time travel."""
