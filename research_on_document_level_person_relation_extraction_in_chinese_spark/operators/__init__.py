"""Pipeline stage operators (SURVEY §2) — each a DataFrame→DataFrame function."""
