//! Golden-vector dump harness for cross-validating the TPU framework
//! against tfhe-rs (run inside the reference tree, where cargo exists).
//!
//! Build: drop this file into the reference as
//!   `concrete-csprng/examples/dump_vectors.rs` (csprng vectors) — the
//! crypto-layer sections need the `tfhe` crate; place the whole file as
//!   `tfhe/examples/dump_vectors.rs` with
//!   `cargo run --release --features=shortint --example dump_vectors > golden.json`
//! and copy the output to `tests/golden/reference.json` in this repo.
//! `tests/test_golden.py` auto-discovers it and compares bit-exactly.
//!
//! Fixture schema (all integers decimal strings, little-endian byte hex):
//! {
//!   "kind": "reference",
//!   "streams": [ {"seed": "<u128 dec>", "first_bytes": "<hex of 64 bytes>",
//!                 "forks": [{"n_children": 4, "bytes_per_child": 8,
//!                            "child_bytes": ["<hex 8B>", ...],
//!                            "parent_next": "<hex 16B>"}] } ],
//!   "secret_keys": [ {"seed": "<u128>", "lwe_dimension": 32,
//!                     "bits": "<hex: one byte per coefficient, 0/1>"} ],
//!   "lwe_encryptions": [ {"secret_seed": "<u128>", "enc_seed": "<u128>",
//!                         "lwe_dimension": 16, "plaintext": "<u64 dec>",
//!                         "std_dev": 1.9e-5,
//!                         "ct": ["<u64 dec>", ...]} ]
//! }

use concrete_csprng::generators::{
    BytesPerChild, ChildrenCount, RandomGenerator, SoftwareRandomGenerator,
};
use concrete_csprng::seeders::Seed;

fn hex(bytes: &[u8]) -> String {
    bytes.iter().map(|b| format!("{:02x}", b)).collect()
}

fn dump_stream(seed: u128) -> String {
    let mut gen = SoftwareRandomGenerator::new(Seed(seed));
    let first: Vec<u8> = (0..64).map(|_| gen.next_byte().unwrap()).collect();

    // fork the SAME generator state used by the framework's fork tree:
    // fresh generator, fork 4 children x 8 bytes, read each child fully,
    // then 16 more parent bytes.
    let mut gen2 = SoftwareRandomGenerator::new(Seed(seed));
    let children = gen2
        .try_fork(ChildrenCount(4), BytesPerChild(8))
        .unwrap()
        .collect::<Vec<_>>();
    let child_bytes: Vec<String> = children
        .into_iter()
        .map(|mut c| hex(&(0..8).map(|_| c.next_byte().unwrap()).collect::<Vec<u8>>()))
        .collect();
    let parent_next: Vec<u8> = (0..16).map(|_| gen2.next_byte().unwrap()).collect();

    format!(
        r#"{{"seed": "{}", "first_bytes": "{}", "forks": [{{"n_children": 4, "bytes_per_child": 8, "child_bytes": [{}], "parent_next": "{}"}}]}}"#,
        seed,
        hex(&first),
        child_bytes
            .iter()
            .map(|c| format!("\"{}\"", c))
            .collect::<Vec<_>>()
            .join(", "),
        hex(&parent_next),
    )
}

// --- crypto-layer dumps: uncomment inside the tfhe crate -------------------
//
// use tfhe::core_crypto::prelude::*;
//
// fn dump_secret_key(seed: u128, n: usize) -> String {
//     let mut secret_gen = SecretRandomGenerator::<SoftwareRandomGenerator>::new(Seed(seed));
//     let sk: LweSecretKeyOwned<u64> =
//         allocate_and_generate_new_binary_lwe_secret_key(LweDimension(n), &mut secret_gen);
//     let bits: Vec<u8> = sk.as_ref().iter().map(|&b| b as u8).collect();
//     format!(r#"{{"seed": "{}", "lwe_dimension": {}, "bits": "{}"}}"#, seed, n, hex(&bits))
// }
//
// fn dump_lwe_encryption(sk_seed: u128, enc_seed: u128, n: usize, pt: u64,
//                        std_dev: f64) -> String {
//     let mut secret_gen = SecretRandomGenerator::<SoftwareRandomGenerator>::new(Seed(sk_seed));
//     let sk: LweSecretKeyOwned<u64> =
//         allocate_and_generate_new_binary_lwe_secret_key(LweDimension(n), &mut secret_gen);
//     let mut enc_gen = EncryptionRandomGenerator::<SoftwareRandomGenerator>::new(
//         Seed(enc_seed), &mut DeterministicSeeder::<SoftwareRandomGenerator>::new(Seed(enc_seed)));
//     let mut ct = LweCiphertextOwned::new(0u64, LweSize(n + 1), CiphertextModulus::new_native());
//     encrypt_lwe_ciphertext(&sk, &mut ct, Plaintext(pt),
//                            Gaussian::from_standard_dev(StandardDev(std_dev), 0.0), &mut enc_gen);
//     let words: Vec<String> = ct.as_ref().iter().map(|w| format!("\"{}\"", w)).collect();
//     format!(r#"{{"secret_seed": "{}", "enc_seed": "{}", "lwe_dimension": {}, "plaintext": "{}", "std_dev": {}, "ct": [{}]}}"#,
//             sk_seed, enc_seed, n, pt, std_dev, words.join(", "))
// }

fn main() {
    let seeds: [u128; 3] = [0, 1, 0x0123_4567_89ab_cdef_fedc_ba98_7654_3210];
    let streams: Vec<String> = seeds.iter().map(|&s| dump_stream(s)).collect();
    println!(
        r#"{{"kind": "reference", "streams": [{}]}}"#,
        streams.join(", ")
    );
}
