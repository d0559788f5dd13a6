"""Domain services: the orchestration facade, matchers, and detectors
(the reference's ``src/services/`` layer, SURVEY.md §2.3)."""
