"""Presentation layer: Streamlit app (when streamlit is installed) and a
dependency-free built-in HTML UI served by the API process at ``/ui``."""
