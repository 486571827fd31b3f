"""Package data shipped with the engine (read via importlib.resources,
which resolves both on-disk and inside the spark-submit --py-files zip).

public_suffix_list.dat — the complete Mozilla Public Suffix List
(https://publicsuffix.org/, MPL 2.0; the file carries its own license
header). Feeds pycore/psl.py → functions/urls.pld_sql.
"""
