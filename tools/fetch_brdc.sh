#!/bin/sh
# Fetch a daily broadcast-ephemeris RINEX file for a given date (the
# equivalent of the reference Makefile's brdc rule, updated to the CDDIS
# HTTPS archive — the old anonymous FTP endpoint is gone and downloads now
# need a (free) NASA Earthdata login, supplied via ~/.netrc).
#
# Usage: fetch_brdc.sh YYYY DDD [outfile]
#   YYYY  four-digit year
#   DDD   day of year, zero-padded (001..366)
#
# Example: fetch_brdc.sh 2014 354 brdc3540.14n
set -eu

YEAR=${1:?usage: fetch_brdc.sh YYYY DDD [outfile]}
DOY=${2:?usage: fetch_brdc.sh YYYY DDD [outfile]}
YY=$(printf '%s' "$YEAR" | cut -c3-4)
NAME="brdc${DOY}0.${YY}n"
OUT=${3:-$NAME}

URL="https://cddis.nasa.gov/archive/gnss/data/daily/${YEAR}/brdc/${NAME}.gz"
echo "fetching $URL" >&2
curl -sSfL -n -c /tmp/.cddis_cookies -b /tmp/.cddis_cookies \
    "$URL" -o "${OUT}.gz"
gunzip -f "${OUT}.gz"
echo "wrote $OUT" >&2
