"""REST backend (role of reference ``src/api/main.py``, SURVEY.md §2.5).

Built on aiohttp (FastAPI is not in this image) with pydantic request
validation. All 18 reference routes are present with the same paths and
response shapes — including ``/api/small-object-detection`` and
``/api/background-independence``, which in the reference call processor
methods that don't exist (SURVEY.md §2.6.6) and here actually work.
"""
