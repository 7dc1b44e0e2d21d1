// Minimal, self-contained stand-in for Boost::program_options covering exactly
// the subset used by the DynEarthSol reference's input.cxx, so the reference
// binary can be built in environments without Boost (used only to generate
// golden outputs for the test suite; not part of the dynearthsol_tpu package).
//
// Covered surface:
//   po::options_description(name) / .add_options()(name, value, help) chains
//   po::value<T>(&target)->default_value(v)  for T in {bool,int,uint,double,string}
//   po::parse_config_file<char>(filename, desc)  (INI dialect: [section], k = v,
//       '#' comments, values kept verbatim for list options like "[a,b]")
//   po::store / po::notify / po::variables_map::{count,operator[]} / .as<T>()
//   boost::program_options::multiple_occurrences (with get_option_name())
//   operator<<(ostream, options_description) for --help
//
// Semantics replicated from Boost: defaulted options are present in the
// variables_map (count()==1), duplicate keys in one config file throw
// multiple_occurrences, unknown keys throw (caught by the reference as a
// generic parse error).
#ifndef PO_SHIM_HPP
#define PO_SHIM_HPP

#include <algorithm>
#include <cctype>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <map>
#include <memory>
#include <ostream>
#include <set>
#include <sstream>
#include <stdexcept>
#include <string>
#include <sys/types.h>   // uint
#include <typeinfo>
#include <vector>

namespace boost {
namespace program_options {

class error : public std::runtime_error {
public:
    explicit error(const std::string& what) : std::runtime_error(what) {}
};

class multiple_occurrences : public error {
public:
    explicit multiple_occurrences(const std::string& opt)
        : error("option '" + opt + "' cannot be specified more than once"),
          opt_(opt) {}
    ~multiple_occurrences() throw() {}
    const std::string& get_option_name() const { return opt_; }
private:
    std::string opt_;
};

class invalid_option_value : public error {
public:
    explicit invalid_option_value(const std::string& what) : error(what) {}
};

class unknown_option : public error {
public:
    explicit unknown_option(const std::string& opt)
        : error("unrecognised option '" + opt + "'") {}
};

// ---- type-erased value holder (std::any is C++17; reference builds C++11) ----
class variable_value {
public:
    variable_value() : defaulted_(false) {}

    template <class T>
    void set(const T& v, bool defaulted) {
        holder_.reset(new Holder<T>(v));
        defaulted_ = defaulted;
    }

    template <class T>
    const T& as() const {
        const Holder<T>* h = dynamic_cast<const Holder<T>*>(holder_.get());
        if (!h) throw error("variable_value::as<T>: bad type");
        return h->value;
    }

    bool defaulted() const { return defaulted_; }
    bool empty() const { return !holder_; }

private:
    struct HolderBase {
        virtual ~HolderBase() {}
    };
    template <class T>
    struct Holder : HolderBase {
        explicit Holder(const T& v) : value(v) {}
        T value;
    };
    std::shared_ptr<HolderBase> holder_;
    bool defaulted_;
};

class variables_map : public std::map<std::string, variable_value> {
public:
    std::size_t count(const std::string& name) const {
        return std::map<std::string, variable_value>::count(name);
    }
    variable_value& operator[](const std::string& name) {
        return std::map<std::string, variable_value>::operator[](name);
    }
    const variable_value& operator[](const std::string& name) const {
        static const variable_value empty_vv;
        const_iterator it = find(name);
        return it == end() ? empty_vv : it->second;
    }
};

// ---- value semantics ----
class value_semantic {
public:
    virtual ~value_semantic() {}
    // Parse text into vv (explicit user-provided value).
    virtual void parse(const std::string& text, variable_value& vv) const = 0;
    virtual bool has_default() const = 0;
    virtual void apply_default(variable_value& vv) const = 0;
    virtual bool is_required() const = 0;
    // Write vv into the bound target, if any.
    virtual void notify(const variable_value& vv) const = 0;
};

class required_option : public error {
public:
    explicit required_option(const std::string& opt)
        : error("the option '" + opt + "' is required but missing") {}
};

namespace detail {

inline std::string trim(const std::string& s) {
    std::size_t b = 0, e = s.size();
    while (b < e && std::isspace(static_cast<unsigned char>(s[b]))) ++b;
    while (e > b && std::isspace(static_cast<unsigned char>(s[e - 1]))) --e;
    return s.substr(b, e - b);
}

template <class T>
inline T parse_scalar(const std::string& text);

template <>
inline std::string parse_scalar<std::string>(const std::string& text) {
    return text;
}

template <>
inline bool parse_scalar<bool>(const std::string& text) {
    std::string t(text);
    std::transform(t.begin(), t.end(), t.begin(), ::tolower);
    if (t == "1" || t == "true" || t == "yes" || t == "on") return true;
    if (t == "0" || t == "false" || t == "no" || t == "off") return false;
    throw invalid_option_value("invalid bool value '" + text + "'");
}

template <>
inline int parse_scalar<int>(const std::string& text) {
    char* endp = 0;
    long v = std::strtol(text.c_str(), &endp, 10);
    if (endp == text.c_str() || *endp != '\0')
        throw invalid_option_value("invalid int value '" + text + "'");
    return static_cast<int>(v);
}

template <>
inline uint parse_scalar<uint>(const std::string& text) {
    char* endp = 0;
    unsigned long v = std::strtoul(text.c_str(), &endp, 10);
    if (endp == text.c_str() || *endp != '\0')
        throw invalid_option_value("invalid uint value '" + text + "'");
    return static_cast<uint>(v);
}

template <>
inline double parse_scalar<double>(const std::string& text) {
    char* endp = 0;
    double v = std::strtod(text.c_str(), &endp);
    if (endp == text.c_str() || *endp != '\0')
        throw invalid_option_value("invalid double value '" + text + "'");
    return v;
}

}  // namespace detail

template <class T>
class typed_value : public value_semantic {
public:
    explicit typed_value(T* store_to)
        : store_to_(store_to), has_default_(false), required_(false) {}

    typed_value* default_value(const T& v) {
        default_ = v;
        has_default_ = true;
        return this;
    }

    typed_value* required() {
        required_ = true;
        return this;
    }

    void parse(const std::string& text, variable_value& vv) const {
        vv.set<T>(detail::parse_scalar<T>(text), false);
    }
    bool has_default() const { return has_default_; }
    void apply_default(variable_value& vv) const { vv.set<T>(default_, true); }
    bool is_required() const { return required_; }
    void notify(const variable_value& vv) const {
        if (store_to_) *store_to_ = vv.as<T>();
    }

private:
    T* store_to_;
    bool has_default_;
    bool required_;
    T default_;
};

template <class T>
inline typed_value<T>* value(T* store_to) {
    return new typed_value<T>(store_to);
}

template <class T>
inline typed_value<T>* value() {
    return new typed_value<T>(static_cast<T*>(0));
}

// ---- options description ----
struct option_entry {
    std::string name;
    std::shared_ptr<const value_semantic> semantic;
    std::string help;
};

class options_description;

class options_adder {
public:
    explicit options_adder(options_description& owner) : owner_(owner) {}
    options_adder& operator()(const char* name, const value_semantic* s,
                              const char* help = "");
private:
    options_description& owner_;
};

class options_description {
public:
    explicit options_description(const std::string& caption = "")
        : caption_(caption) {}

    options_adder add_options() { return options_adder(*this); }

    void add(const std::string& name, const value_semantic* s,
             const std::string& help) {
        option_entry e;
        e.name = name;
        e.semantic.reset(s);
        e.help = help;
        entries_.push_back(e);
    }

    const std::vector<option_entry>& entries() const { return entries_; }

    const option_entry* find(const std::string& name) const {
        for (std::size_t i = 0; i < entries_.size(); ++i)
            if (entries_[i].name == name) return &entries_[i];
        return 0;
    }

    const std::string& caption() const { return caption_; }

private:
    std::string caption_;
    std::vector<option_entry> entries_;
};

inline options_adder& options_adder::operator()(const char* name,
                                                const value_semantic* s,
                                                const char* help) {
    owner_.add(name, s, help);
    return *this;
}

inline std::ostream& operator<<(std::ostream& os, const options_description& d) {
    os << d.caption() << ":\n";
    for (std::size_t i = 0; i < d.entries().size(); ++i) {
        const option_entry& e = d.entries()[i];
        os << "  " << e.name << "\n";
        if (!e.help.empty()) {
            std::istringstream helplines(e.help);
            std::string line;
            while (std::getline(helplines, line)) os << "      " << line << "\n";
        }
    }
    return os;
}

// ---- config-file parsing ----
struct parsed_options {
    const options_description* description;
    std::vector<std::pair<std::string, std::string> > options;  // (name, raw text)
};

template <class charT>
inline parsed_options parse_config_file(const char* filename,
                                        const options_description& desc) {
    std::ifstream f(filename);
    if (!f) throw error(std::string("can not read options configuration file '") +
                        filename + "'");
    parsed_options result;
    result.description = &desc;
    std::string line, section;
    while (std::getline(f, line)) {
        std::string::size_type hash = line.find('#');
        if (hash != std::string::npos) line.erase(hash);
        line = detail::trim(line);
        if (line.empty()) continue;
        if (line[0] == '[' && line[line.size() - 1] == ']') {
            section = detail::trim(line.substr(1, line.size() - 2));
            continue;
        }
        std::string::size_type eq = line.find('=');
        if (eq == std::string::npos)
            throw error("syntax error in config file line: '" + line + "'");
        std::string key = detail::trim(line.substr(0, eq));
        std::string val = detail::trim(line.substr(eq + 1));
        std::string full = section.empty() ? key : section + "." + key;
        if (!desc.find(full)) throw unknown_option(full);
        result.options.push_back(std::make_pair(full, val));
    }
    return result;
}

inline const options_description*& last_description(
    const options_description* set_to = 0) {
    static const options_description* desc = 0;
    if (set_to) desc = set_to;
    return desc;
}

inline void store(const parsed_options& parsed, variables_map& vm) {
    std::set<std::string> seen;
    for (std::size_t i = 0; i < parsed.options.size(); ++i) {
        const std::string& name = parsed.options[i].first;
        if (!seen.insert(name).second) throw multiple_occurrences(name);
        variables_map::iterator it = vm.find(name);
        if (it != vm.end() && !it->second.defaulted())
            throw multiple_occurrences(name);
        const option_entry* e = parsed.description->find(name);
        variable_value vv;
        e->semantic->parse(parsed.options[i].second, vv);
        vm[name] = vv;
    }
    // Boost keeps defaulted options in the map (count()==1 for them).
    const std::vector<option_entry>& entries = parsed.description->entries();
    for (std::size_t i = 0; i < entries.size(); ++i) {
        if (entries[i].semantic->has_default() &&
            vm.find(entries[i].name) == vm.end()) {
            variable_value vv;
            entries[i].semantic->apply_default(vv);
            vm[entries[i].name] = vv;
        }
    }
    // Remember the description so notify() can find the semantics.
    last_description(parsed.description);
}

inline void notify(variables_map& vm) {
    const options_description* desc = last_description();
    if (!desc) return;
    const std::vector<option_entry>& entries = desc->entries();
    for (std::size_t i = 0; i < entries.size(); ++i) {
        if (entries[i].semantic->is_required() &&
            vm.find(entries[i].name) == vm.end())
            throw required_option(entries[i].name);
    }
    for (variables_map::const_iterator it = vm.begin(); it != vm.end(); ++it) {
        const option_entry* e = desc->find(it->first);
        if (e) e->semantic->notify(it->second);
    }
}

}  // namespace program_options
}  // namespace boost

#endif  // PO_SHIM_HPP
