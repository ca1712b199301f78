"""The ONE canonicalization that defines "same result" for both checker
tools (oracle_check.py's cross-engine parity and determinism_check.py's
cross-run bit equality): columns sorted by name, object columns cast to
str, rows sorted by every column, index reset. Two private copies could
drift (e.g. a NaN- or nested-type fix applied to one tool only) and make
the two gates disagree about the same parquet — so there is exactly one.
"""


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)
