#!/bin/sh
# Builds the standalone reference (SEAL 4.0 C++) decomposition timing harness
# against the read-only reference tree. Usage: ./build.sh && ./refbench [reps]
set -e
REF=${REF:-/root/reference}
gcc -O2 -march=native -c $REF/libs/keccak/KeccakHash.c $REF/libs/keccak/KeccakSpongeWidth1600.c \
    $REF/libs/keccak/opt64/KeccakP-1600-opt64.c -I $REF/libs/keccak -I $REF/libs/keccak/opt64
g++ -O2 -std=c++17 -march=native -o refbench main.cpp \
    $REF/src/pasta/pasta_3_plain.cpp $REF/src/pasta/pasta_3_seal.cpp $REF/src/pasta/SEAL_Cipher.cpp \
    KeccakHash.o KeccakSpongeWidth1600.o KeccakP-1600-opt64.o \
    -I $REF/src/pasta -I $REF/libs/seal/include/SEAL-4.0 -I $REF/libs/keccak -I $REF/libs/keccak/opt64 \
    $REF/libs/seal/lib/libseal-4.0.a -pthread
