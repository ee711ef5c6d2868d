"""Operator library: each module re-expresses one SURVEY.md §2 family
as composable DataFrame -> DataFrame functions (no driver-side loops)."""
