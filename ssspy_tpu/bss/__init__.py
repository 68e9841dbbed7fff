"""BSS algorithm families (populated bottom-up; see SURVEY.md §7)."""
