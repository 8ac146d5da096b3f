#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/rdf_rdfa_spark.zip
python3 -c "
import zipfile, os
with zipfile.ZipFile('dist/rdf_rdfa_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk('rdf_rdfa_spark'):
        dirs[:] = [d for d in dirs if d != '__pycache__']
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('dist/rdf_rdfa_spark.zip written')
"
